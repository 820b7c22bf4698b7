"""Per-stage timing of the codec inference path on the TPU.

Times each encoder block, the quantizer, and each decoder block at the bench
config (batch 32 x 3 s @ 24 kHz, bf16 convs + f32 RVQ), plus the fused
end-to-end call. Tunnel-safe AND dispatch-safe: each stage is repeated R
times INSIDE one jit with an output->input data dependency (so XLA cannot
parallelize or elide the repeats), the host transfer forces completion, and
the ~25 ms/dispatch tunnel overhead is amortized 1/R.

Usage: python tools/profile_codec.py [batch] [iters] [repeats]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from audio_generation_tpu.models import CausalVQAE

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    R = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    length = 72000

    model = CausalVQAE(
        in_channels=1, num_quantizers=8, codebook_size=1024, codebook_dim=512,
        input_format="n c l", vq_type="ema", use_som=True,
        som_kernel_type="hard", compute_dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 1, length)).astype(np.float32) * 0.1)
    variables = model.init(jax.random.key(0), x)

    def probe(y):
        if isinstance(y, tuple):
            y = y[0]
        return jnp.sum(y[..., ::37].astype(jnp.float32))

    # ---- intermediate activations (computed once, not timed) ---------------
    @jax.jit
    def enc_stages(v, x):
        blc = model.apply(v, x, method=lambda m, t: m._to_blc(t).astype(m.compute_dtype))
        h0 = model.apply(v, blc, method=lambda m, t: m.enc_stem(t))
        hs = [h0]
        h = h0
        for i in range(model.n_blocks):
            h = model.apply(v, (h, i), method=lambda m, t: m.enc_blocks[t[1]](t[0]))
            hs.append(h)
        z = model.apply(v, h, method=lambda m, t: m.enc_out(t))
        return blc, hs, z

    blc, hs, z = enc_stages(variables, x)

    @jax.jit
    def quant(v, z):
        (zq, idx, commit), _ = model.apply(
            v, z, method=lambda m, t: m.bottleneck_fn(t), mutable=["codebook"]
        )
        return zq

    zq = quant(variables, z)

    @jax.jit
    def dec_stages(v, zq):
        h = model.apply(v, zq.astype(model.compute_dtype), method=lambda m, t: m.dec_stem(t))
        hs = [h]
        for i in range(model.n_blocks):
            h = model.apply(v, (h, i), method=lambda m, t: m.dec_blocks[t[1]](t[0]))
            hs.append(h)
        y = model.apply(v, h, method=lambda m, t: m.dec_out(t))
        return hs, y

    dhs, y = dec_stages(variables, zq)

    rows = []

    def time_repeated(name, f, a):
        """f(v, a) -> array. Repeated R times with a data dependency."""

        @jax.jit
        def rep(v, a):
            def body(i, carry):
                inp, acc = carry
                out = f(v, inp)
                p = probe(out)
                # fold an output-dependent zero back into the input: forces
                # sequential execution without changing values materially
                inp = inp + (p * 0.0).astype(inp.dtype)
                return (inp, acc + p)

            _, acc = jax.lax.fori_loop(0, R, body, (a, jnp.float32(0.0)))
            return acc

        float(rep(variables, a))  # compile + warmup
        lat = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(rep(variables, a))
            lat.append(time.perf_counter() - t0)
        p50 = float(np.percentile(lat, 50)) / R
        rows.append((name, p50 * 1e3, tuple(a.shape)))

    time_repeated("enc_stem (k7 1->32)", lambda v, t: model.apply(v, t, method=lambda m, u: m.enc_stem(u)), blc)
    for i in range(model.n_blocks):
        time_repeated(
            f"enc_block{i} ({hs[i].shape[1]}x{hs[i].shape[2]}->{hs[i+1].shape[2]})",
            lambda v, t, i=i: model.apply(v, t, method=lambda m, u: m.enc_blocks[i](u)),
            hs[i],
        )
    time_repeated("enc_out (k3 1024->512)", lambda v, t: model.apply(v, t, method=lambda m, u: m.enc_out(u)), hs[-1])
    time_repeated("rvq x8 (f32)", lambda v, t: quant(v, t), z)
    time_repeated("dec_stem (k7 512->1024)", lambda v, t: model.apply(v, t.astype(model.compute_dtype), method=lambda m, u: m.dec_stem(u)), zq)
    for i in range(model.n_blocks):
        time_repeated(
            f"dec_block{i} ({dhs[i].shape[1]}x{dhs[i].shape[2]}->{dhs[i+1].shape[2]})",
            lambda v, t, i=i: model.apply(v, t, method=lambda m, u: m.dec_blocks[i](u)),
            dhs[i],
        )
    time_repeated("dec_out (k7 32->1)", lambda v, t: model.apply(v, t, method=lambda m, u: m.dec_out(u)), dhs[-1])

    # fused end-to-end (single-dispatch, like bench.py)
    @jax.jit
    def full(v, x):
        (yy, _c, ii), _ = model.apply(v, x, mutable=["codebook"])
        return jnp.sum(yy[:, :, ::1024]) + jnp.sum(ii[:, ::64, :]).astype(jnp.float32)

    float(full(variables, x))
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(full(variables, x))
        lat.append(time.perf_counter() - t0)
    p50_full = float(np.percentile(lat, 50))

    total = sum(r[1] for r in rows)
    print(f"\nbatch={batch} len={length} bf16-convs f32-rvq  ({iters} iters x {R} in-jit repeats, p50 ms)")
    print(f"{'stage':<44}{'p50 ms':>10}{'% of sum':>10}   shape-in")
    for name, ms, shape in rows:
        print(f"{name:<44}{ms:>10.3f}{100*ms/total:>9.1f}%   {shape}")
    print(f"{'SUM of stages':<44}{total:>10.2f}")
    print(f"{'fused encode+decode (single dispatch)':<44}{p50_full*1e3:>10.2f}")
    print(f"audio-s/s fused: {batch*3/p50_full:.1f}")


if __name__ == "__main__":
    main()

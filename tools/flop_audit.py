"""Static FLOP audit of the flagship codec's conv inventory: true MACs vs
MACs actually issued under the lane-fold execution law (ops/conv.py), per
stage.  Pure arithmetic — no JAX — used to decide where folded-kernel FLOP
overhead concentrates (round-3 perf work).

Fold law (ops/conv.py folded_causal_conv1d): fold f, kernel k, dilation d
=> folded taps k_f = ceil(((k-1)*d)/f) + 1, folded kernel (k_f, f*C_in, f*C_out)
issued MACs = L/f * k_f * (f*C_in) * (f*C_out) = L * k_f * f * C_in * C_out
true MACs  = L * k * C_in * C_out          (ratio = k_f * f / k)
"""
from __future__ import annotations

import math


def fold_for(length, channels, target=128):
    f_max = max(target // max(channels, 1), 1)
    for f in range(f_max, 1, -1):
        if length % f == 0:
            return f
    return 1


def conv(name, L, cin, cout, k, d=1, fold=1, stride=1):
    true = L // stride * k * cin * cout
    if fold > 1:
        kf = math.ceil(((k - 1) * d) / fold) + 1
        issued = L // stride // fold * kf * (fold * cin) * (fold * cout)
    else:
        kf, issued = k, true
    return dict(name=name, L=L, cin=cin, cout=cout, k=k, d=d, fold=fold,
                true=true, issued=issued)


def flagship(B=32, L=72000):
    rows = []
    # models/vae.py flagship: chans = 32*2^i for i in 0..5 = [32..1024],
    # strides (2,3,4,4,5); encoder stacks run at the block INPUT rate/chans,
    # decoder stacks at the block OUTPUT rate/chans.
    chans = [32, 64, 128, 256, 512, 1024]
    strides = [2, 3, 4, 4, 5]
    f = fold_for(L, 32)
    rows.append(conv("enc_stem", L, 1, 32, 7, fold=f))
    rate = L
    for i, s in enumerate(strides):
        cblk = chans[i]
        f = fold_for(rate, cblk)
        for j, d in enumerate((1, 3, 9)):
            rows.append(conv(f"enc{i}.res{j}.conv{d}", rate, cblk, cblk, 7, d=d, fold=f))
            rows.append(conv(f"enc{i}.res{j}.1x1", rate, cblk, cblk, 1, fold=f))
        rows.append(conv(f"enc{i}.down", rate, cblk, chans[i + 1], 2 * s + 1, stride=s))
        rate //= s
    rows.append(conv("enc_out", rate, 1024, 512, 3))
    # decoder: stem convT 512->1024 at latent rate, blocks upsample in reverse
    rows.append(conv("dec_stem", rate, 512, 1024, 7))
    dec_chans = [512, 256, 128, 64, 32]
    dec_strides = [5, 4, 4, 3, 2]
    cin = 1024
    for i, (s, cout) in enumerate(zip(dec_strides, dec_chans)):
        out_rate = rate * s
        # upsampler: phase-decomposed = low-rate conv emitting s*cout (1x cost)
        rows.append(conv(f"dec{i}.up", rate, cin, s * cout, 2 * s + 1))
        f = fold_for(out_rate, cout)
        for j, d in enumerate((1, 3, 9)):
            rows.append(conv(f"dec{i}.res{j}.conv{d}", out_rate, cout, cout, 7, d=d, fold=f))
            rows.append(conv(f"dec{i}.res{j}.1x1", out_rate, cout, cout, 1, fold=f))
        rate, cin = out_rate, cout
    rows.append(conv("dec_out", rate, 32, 1, 7, fold=fold_for(rate, 32)))

    for r in rows:
        r["true"] *= B
        r["issued"] *= B
    return rows


def main():
    rows = flagship()
    t_true = sum(r["true"] for r in rows)
    t_iss = sum(r["issued"] for r in rows)
    print(f"{'conv':24s} {'L':>7s} {'CinxCout':>9s} {'k':>2s} {'d':>2s} {'f':>2s}"
          f" {'trueGF':>8s} {'issGF':>8s} {'ratio':>6s} {'%iss':>5s}")
    for r in sorted(rows, key=lambda r: -r["issued"]):
        print(f"{r['name']:24s} {r['L']:7d} {r['cin']:4d}x{r['cout']:<4d} {r['k']:2d}"
              f" {r['d']:2d} {r['fold']:2d} {2*r['true']/1e9:8.1f} {2*r['issued']/1e9:8.1f}"
              f" {r['issued']/r['true']:6.2f} {100*r['issued']/t_iss:5.1f}")
    print(f"\ntotal true {2*t_true/1e9:.0f} GFLOP, issued {2*t_iss/1e9:.0f} GFLOP "
          f"(x{t_iss/t_true:.2f}); v5e bf16 peak 197 TFLOP/s -> "
          f"{2*t_iss/197e12*1e3:.1f} ms issued-bound, {2*t_true/197e12*1e3:.1f} ms true-bound")


if __name__ == "__main__":
    main()

"""Residual vector quantizer with EMA and self-organizing-map codebooks.

This is the framework-native implementation of the reference's external
`som_quantizer` dependency, whose API is fully determined by its call sites
(SURVEY.md §2.3; reference: networks/vae.py:245-251,315-318,333,350-351 and
networks/training.py:325-328,435,454):

    ResidualQuantizer(num_quantizers, dim, quantizer_class, codebook_sizes,
                      vq_cutoff_freq, use_som, som_kernel_type)
    __call__(x[b,l,c], codebook_n, update_codebook, prioritize_early)
        -> (x_quantized, indices, commit_loss)
    quantizers[i].dequantize(indices) ; update_cutoff ; get_stale_clusters

TPU-first design decisions:
  * Codebooks are STATE, not gradient-trained parameters: EMA and Kohonen/SOM
    updates are pure state transitions computed *as matmuls* — the per-frame
    neighborhood weights W = K[indices] (frames x size) give
    counts = 1^T W and sums = W^T x on the MXU. Plain EMA-VQ is the special
    case K = I; a SOM is K = neighborhood kernel on the 2-D grid. No scatters.
  * The level loop is a `lax.scan` over stacked (nq, S, D) codebooks; the
    bitrate/codebook-dropout knob `codebook_n` is a *traced* scalar applied as
    a per-level mask, so one compiled step serves every dropout setting.
  * Distances use f32 HIGHEST-precision matmuls so codebook indices are
    bit-exact against a CPU reference (BASELINE.json correctness bar).

Semantics notes (the external lib is not in the reference tree, so these are
defined here and documented):
  * `vq_cutoff_freq` is the SOM neighborhood-annealing knob: the neighborhood
    radius is `cutoff * max(grid_h, grid_w) / 2`, decayed x0.95/epoch by the
    trainer (networks/training.py:454) — classic Kohonen annealing toward
    plain VQ. "hard" kernel = binary disk, "gaussian" = exp(-d^2 / 2 sigma^2).
  * `prioritize_early=True` weights per-level commit losses by (nq - i),
    biasing optimization pressure toward early quantizers (the reference
    trainer flips this flag at networks/training.py:264,325-328).
  * "base" quantizer = batch Kohonen/k-means codebook step with learning rate
    `codebook_lr`; "ema" = EMA counts/means with Laplace smoothing.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Optional, Sequence

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from audio_generation_tpu.utils.misc import approximate_square_root, tuple_checker


@flax.struct.dataclass
class QuantizerState:
    """Pure-functional quantizer state (a pytree).

    codebooks:  (nq, S, D) codebook vectors
    ema_counts: (nq, S)    EMA of (neighborhood-weighted) assignment counts
    ema_means:  (nq, S, D) EMA of (neighborhood-weighted) assigned-vector sums
    usage:      (nq, S)    EMA of raw assignment counts (stale-entry tracking)
    cutoff:     ()         SOM neighborhood annealing knob (vq_cutoff_freq)
    """

    codebooks: jnp.ndarray
    ema_counts: jnp.ndarray
    ema_means: jnp.ndarray
    usage: jnp.ndarray
    cutoff: jnp.ndarray


@dataclass(frozen=True)
class ResidualQuantizer:
    """Static configuration (hashable; safe as a jit static argument)."""

    num_quantizers: int = 8
    dim: int = 512
    codebook_sizes: Sequence[int] | int = 1024
    quantizer_class: str = "ema"  # "base" | "ema"
    vq_cutoff_freq: float = 1.0
    use_som: bool = True
    som_kernel_type: str = "hard"  # "hard" | "gaussian"
    differentiable_som: bool = False  # soft-assignment SOM (arXiv:2302.07950):
    # the commit loss and the codebook update use softmax(-dist/T) assignment
    # probabilities instead of the hard winner, so encoder gradients flow
    # through the (neighborhood-shaped) assignment itself; emitted CODES stay
    # hard argmin. BASELINE config #5; reference README.md:10.
    som_temperature: float = 1.0
    ema_decay: float = 0.99
    codebook_lr: float = 0.3  # "base" batch-Kohonen learning rate
    commitment_weight: float = 0.25
    stale_threshold: float = 1e-2
    laplace_eps: float = 1e-5
    restart_stale: bool = False  # dead-entry reactivation (standard EMA-VQ
    # restart; the reference TRACKS staleness but never acts on it —
    # networks/training.py:461, networks/utils.py:176-181, which left 50-60%
    # of deep-level entries dead in round-3 campaigns). When on, every
    # codebook-updating step re-seeds entries whose usage EMA fell below
    # `stale_threshold` with the current batch's WORST-quantized residuals
    # (the under-covered points — a better target than the uniform-random
    # restart because it moves capacity exactly where the error is).
    restart_usage_reset: float = 1.0  # usage EMA value granted to a restarted
    # entry: at decay 0.99 it takes ~460 un-hit steps to fall back below the
    # 1e-2 threshold, giving the new entry time to capture assignments
    # before it can be restarted again (anti-thrash).

    def __post_init__(self):
        sizes = tuple(tuple_checker(self.codebook_sizes, self.num_quantizers))
        object.__setattr__(self, "codebook_sizes", sizes)

    # ---- static geometry -------------------------------------------------
    @property
    def max_size(self) -> int:
        return max(self.codebook_sizes)

    @property
    def som_grid(self) -> tuple[int, int]:
        """(height, width) of the SOM grid for the *first* codebook
        (reference: utils.py:244-245 reads quantizers[0].som.height/width)."""
        return approximate_square_root(self.codebook_sizes[0])

    def _grid_dist2(self) -> np.ndarray:
        """Squared grid distances (nq, S, S) between codebook entries laid on
        each level's 2-D SOM grid (entries beyond a level's size are inert)."""
        S = self.max_size
        out = np.zeros((self.num_quantizers, S, S), dtype=np.float32)
        for q, size in enumerate(self.codebook_sizes):
            h, w = approximate_square_root(size)
            pos = np.stack(np.unravel_index(np.arange(size), (h, w)), axis=-1).astype(np.float32)
            d2 = ((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
            out[q, :size, :size] = d2
        return out

    def _size_mask(self) -> np.ndarray:
        """(nq, S) True where a codebook entry exists (per-level sizes)."""
        S = self.max_size
        mask = np.zeros((self.num_quantizers, S), dtype=bool)
        for q, size in enumerate(self.codebook_sizes):
            mask[q, :size] = True
        return mask

    # ---- state -----------------------------------------------------------
    def init_state(self, rng: jax.Array) -> QuantizerState:
        S, D, nq = self.max_size, self.dim, self.num_quantizers
        codebooks = jax.random.normal(rng, (nq, S, D), dtype=jnp.float32) / np.sqrt(D)
        codebooks = codebooks * jnp.asarray(self._size_mask())[..., None]
        # EMA state must satisfy means / counts == codebooks at init so unused
        # entries decay coherently (counts=0 with nonzero means would divide
        # dead entries by the Laplace epsilon and blow them up)
        return QuantizerState(
            codebooks=codebooks,
            ema_counts=jnp.ones((nq, S), dtype=jnp.float32),
            # distinct buffer (same values): aliased leaves break donation
            ema_means=codebooks + 0.0,
            usage=jnp.ones((nq, S), dtype=jnp.float32),
            cutoff=jnp.asarray(self.vq_cutoff_freq, dtype=jnp.float32),
        )

    def init_state_from_data(self, rng: jax.Array, x: jnp.ndarray) -> QuantizerState:
        """Data-dependent init: sample codebook entries from (perturbed)
        encoder outputs — the functional analog of k-means warm starts."""
        state = self.init_state(rng)
        flat = x.reshape(-1, self.dim)
        n = flat.shape[0]
        idx = jax.random.randint(rng, (self.num_quantizers, self.max_size), 0, n)
        noise = 0.01 * jax.random.normal(rng, state.codebooks.shape, dtype=jnp.float32)
        codebooks = flat[idx] + noise
        codebooks = codebooks * jnp.asarray(self._size_mask())[..., None]
        return state.replace(
            codebooks=codebooks,
            ema_means=codebooks + 0.0,
            ema_counts=jnp.ones_like(state.ema_counts),
        )

    # ---- kernels ----------------------------------------------------------
    def _neighborhood_kernel(self, cutoff):
        """(nq, S, S) neighborhood weights from the (traced) cutoff knob."""
        d2 = jnp.asarray(self._grid_dist2())
        mask = jnp.asarray(self._size_mask())
        pair_mask = mask[:, :, None] & mask[:, None, :]
        if not self.use_som:
            eye = jnp.eye(self.max_size, dtype=jnp.float32)[None]
            return eye * pair_mask
        h, w = self.som_grid
        radius = cutoff * max(h, w) / 2.0
        if self.som_kernel_type == "hard":
            K = (d2 <= radius**2).astype(jnp.float32)
        elif self.som_kernel_type == "gaussian":
            sigma2 = jnp.maximum(radius**2, 1e-12)
            K = jnp.exp(-d2 / (2.0 * sigma2))
            K = jnp.where(K < 1e-3, 0.0, K)
        else:
            raise ValueError(f"Unknown som_kernel_type {self.som_kernel_type!r}")
        # winner always updates fully
        eye = jnp.eye(self.max_size, dtype=jnp.float32)[None]
        K = jnp.maximum(K, eye)
        return K * pair_mask

    # ---- shared per-level search math (identical in both compiled paths,
    # so inference indices/losses are bit-identical to the training step's) --
    def _search_level(self, residual, codebook, smask):
        """Nearest neighbor + one-hot lookup. Returns (idx, H, q, dist)."""
        S = self.max_size
        dots = jax.lax.dot_general(
            residual,
            codebook,
            (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # (N, S)
        c_norm2 = jnp.sum(codebook * codebook, axis=-1)
        dist = c_norm2[None, :] - 2.0 * dots  # ||r||^2 constant per row
        dist = jnp.where(smask[None, :], dist, jnp.inf)
        idx = jnp.argmin(dist, axis=-1)  # (N,)
        # one-hot assignment matrix: every downstream lookup/update becomes
        # a matmul (MXU) — no gathers or scatters on TPU.
        H = jax.nn.one_hot(idx, S, dtype=jnp.float32)  # (N, S)
        q = jax.lax.dot_general(
            H, codebook, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # (N, D)
        return idx, H, q, dist

    def _commit_level(self, residual, q, dist, smask):
        """Per-level commit loss; returns (commit, assign) where assign is the
        (stop-gradient) assignment matrix used for codebook updates (soft
        probabilities under differentiable_som, else None -> use hard H)."""
        D = self.dim
        if self.differentiable_som:
            logits = jnp.where(smask[None, :], -dist / self.som_temperature, -jnp.inf)
            P = jax.nn.softmax(logits, axis=-1)  # (N, S)
            r2 = jnp.sum(residual * residual, axis=-1)
            soft_d2 = r2 + jnp.sum(P * jnp.where(smask[None, :], dist, 0.0), axis=-1)
            return jnp.mean(soft_d2 / D), jax.lax.stop_gradient(P)
        commit = jnp.mean(jnp.sum((residual - jax.lax.stop_gradient(q)) ** 2, axis=-1) / D)
        return commit, None

    def _quantize_inference(self, state, flat, bl, codebook_n, size_mask, level_ids, level_w):
        """Update-free cascade: the same search/commit math as the training
        path with all codebook-update matmuls structurally absent."""
        nq, D = self.num_quantizers, self.dim
        B, L = bl

        def level_step(carry, inputs):
            residual, quant_sum = carry
            codebook, smask, lvl = inputs
            active = lvl < codebook_n
            idx, H, q, dist = self._search_level(residual, codebook, smask)
            commit, _ = self._commit_level(residual, q, dist, smask)
            a = active.astype(jnp.float32)
            quant_sum = quant_sum + a * q
            residual = residual - a * jax.lax.stop_gradient(q)
            idx_out = jnp.where(active, idx, 0)
            return (residual, quant_sum), (idx_out, commit * a)

        init = (flat, jnp.zeros_like(flat))
        (_, quant_sum), (indices, commits) = jax.lax.scan(
            level_step, init, (state.codebooks, size_mask, level_ids)
        )
        x_q = flat + jax.lax.stop_gradient(quant_sum - flat)
        x_q = x_q.reshape(B, L, D)
        w = level_w * (level_ids < codebook_n)
        commit_loss = self.commitment_weight * jnp.sum(commits * level_w) / jnp.maximum(
            jnp.sum(w), 1.0
        )
        indices = indices.reshape(nq, B, L).transpose(1, 2, 0)  # (B, L, nq)
        return x_q, indices, commit_loss, state

    # ---- forward ----------------------------------------------------------
    def __call__(
        self,
        state: QuantizerState,
        x: jnp.ndarray,
        codebook_n=None,
        update_codebook=False,
        prioritize_early=False,
    ):
        """Quantize x (B, L, D) through the residual cascade.

        Returns (x_quantized, indices, commit_loss, new_state) — the first
        three match the reference call site (networks/vae.py:315-318); state
        is threaded functionally. `codebook_n` and `update_codebook` may be
        traced; `prioritize_early` must be static (it reweights a constant).
        """
        nq, S, D = self.num_quantizers, self.max_size, self.dim
        B, L, _ = x.shape
        flat = x.reshape(-1, D).astype(jnp.float32)
        N = flat.shape[0]

        if codebook_n is None:
            codebook_n = nq
        codebook_n = jnp.asarray(codebook_n, dtype=jnp.int32)
        # When the caller passes a static Python False (the inference path),
        # skip the update computation STRUCTURALLY. Merely gating it with
        # `where` keeps the W = H@K (N x S x S) and sums = W^T r (S x N x D)
        # matmuls in the compiled graph — float mul-by-zero is not
        # algebraically removable and the new state is a live output — which
        # costs ~2.5x the nearest-neighbor search itself. A traced flag (the
        # training path) keeps the gated form so one compiled step serves
        # both update settings.
        static_no_update = isinstance(update_codebook, bool) and not update_codebook
        update_flag = jnp.asarray(update_codebook)

        size_mask = jnp.asarray(self._size_mask())  # (nq, S)
        level_ids = jnp.arange(nq)

        if prioritize_early:
            level_w = jnp.arange(nq, 0, -1, dtype=jnp.float32)
        else:
            level_w = jnp.ones((nq,), dtype=jnp.float32)

        if static_no_update:
            return self._quantize_inference(
                state, flat, (B, L), codebook_n, size_mask, level_ids, level_w
            )

        K = self._neighborhood_kernel(state.cutoff)  # (nq, S, S)

        def level_step(carry, inputs):
            residual, quant_sum = carry
            codebook, ema_count, ema_mean, usage, K_q, smask, lvl = inputs
            active = lvl < codebook_n  # traced bool

            # nearest neighbor: ||r||^2 - 2 r.c + ||c||^2 ; masked beyond size
            dots = jax.lax.dot_general(
                residual,
                codebook,
                (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )  # (N, S)
            c_norm2 = jnp.sum(codebook * codebook, axis=-1)
            dist = c_norm2[None, :] - 2.0 * dots  # ||r||^2 constant per row
            dist = jnp.where(smask[None, :], dist, jnp.inf)
            idx = jnp.argmin(dist, axis=-1)  # (N,)
            # one-hot assignment matrix: every downstream lookup/update
            # becomes a matmul (MXU) — no gathers or scatters on TPU.
            H = jax.nn.one_hot(idx, S, dtype=jnp.float32)  # (N, S)
            q = jax.lax.dot_general(
                H, codebook, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )  # (N, D)

            if self.differentiable_som:
                # soft assignments: P = softmax(-||r - c||^2 / T). The per-row
                # ||r||^2 constant cancels in the softmax, so `dist` works
                # as the (negated) logit directly. Gradients reach the encoder
                # both through the quadratic form AND through P itself — the
                # differentiable-SOM gradient (arXiv:2302.07950).
                logits = jnp.where(smask[None, :], -dist / self.som_temperature, -jnp.inf)
                P = jax.nn.softmax(logits, axis=-1)  # (N, S)
                # E_P ||r - c||^2 = ||r||^2 + sum_j P_j (||c_j||^2 - 2 r.c_j)
                r2 = jnp.sum(residual * residual, axis=-1)
                soft_d2 = r2 + jnp.sum(P * jnp.where(smask[None, :], dist, 0.0), axis=-1)
                commit = jnp.mean(soft_d2 / D)
                assign = jax.lax.stop_gradient(P)
            else:
                # per-level commit loss (encoder-side); codebook learns via
                # EMA/Kohonen below, not via gradients.
                commit = jnp.mean(
                    jnp.sum((residual - jax.lax.stop_gradient(q)) ** 2, axis=-1) / D
                )
                assign = H

            # ---- codebook update (pure, matmul-shaped) ----
            W = jax.lax.dot_general(
                assign, K_q, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )  # (N, S) neighborhood weights of each (soft) winner
            counts = jnp.sum(W, axis=0)  # (S,)
            sums = jax.lax.dot_general(
                W, residual, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )  # (S, D)
            do_update = jnp.logical_and(update_flag, active)
            gate = do_update.astype(jnp.float32)

            if self.quantizer_class == "ema":
                d_ = self.ema_decay
                new_count = ema_count * (d_ + (1 - d_) * (1 - gate)) + (1 - d_) * gate * counts
                new_mean = ema_mean * (d_ + (1 - d_) * (1 - gate)) + (1 - d_) * gate * sums
                n_total = jnp.sum(new_count)
                smoothed = (
                    (new_count + self.laplace_eps)
                    / (n_total + S * self.laplace_eps)
                    * n_total
                )
                ema_codebook = new_mean / jnp.maximum(smoothed[:, None], 1e-12)
                new_codebook = jnp.where(do_update, ema_codebook, codebook)
            elif self.quantizer_class == "base":
                # batch Kohonen step toward the neighborhood-weighted mean
                batch_mean = sums / jnp.maximum(counts[:, None], 1e-12)
                hit = (counts > 0)[:, None]
                stepped = jnp.where(
                    hit, codebook + self.codebook_lr * (batch_mean - codebook), codebook
                )
                new_codebook = jnp.where(do_update, stepped, codebook)
                new_count, new_mean = ema_count, ema_mean
            else:
                raise ValueError(f"Unknown quantizer_class {self.quantizer_class!r}")
            new_codebook = new_codebook * smask[:, None]

            # raw usage EMA for stale-cluster reporting
            raw_counts = jnp.sum(H, axis=0)
            new_usage = jnp.where(
                active, usage * self.ema_decay + (1 - self.ema_decay) * raw_counts, usage
            )

            if self.restart_stale:
                # Dead-entry reactivation: re-seed stale entries from this
                # batch's highest-error residuals. Scatter-free: candidate
                # selection is an argsort + static tile, the overwrite is a
                # masked `where` over the (S, D) codebook.
                r2 = jnp.sum(residual * residual, axis=-1)  # (N,)
                # ||r - c_win||^2 = ||r||^2 + min_dist (dist omits the ||r||^2
                # row constant); inf beyond-size entries never win the min
                err = r2 + jnp.min(dist, axis=-1)
                order = jnp.argsort(-err)  # worst-covered rows first
                reps = -(-S // order.shape[0])  # static ceil(S / N)
                cand_idx = jnp.tile(order, reps)[:S]
                cand = jax.lax.stop_gradient(
                    jnp.take(residual.astype(jnp.float32), cand_idx, axis=0)
                )  # (S, D)
                stale = (new_usage < self.stale_threshold) & smask & do_update
                new_codebook = jnp.where(stale[:, None], cand, new_codebook)
                # restore the init invariant means / counts == codebook so the
                # EMA continues coherently from the re-seeded vector
                new_count = jnp.where(stale, 1.0, new_count)
                new_mean = jnp.where(stale[:, None], cand, new_mean)
                new_usage = jnp.where(stale, self.restart_usage_reset, new_usage)

            # accumulate (masked by active level)
            a = active.astype(jnp.float32)
            quant_sum = quant_sum + a * q
            residual = residual - a * jax.lax.stop_gradient(q)
            idx_out = jnp.where(active, idx, 0)
            return (residual, quant_sum), (
                idx_out,
                commit * a,
                new_codebook,
                new_count,
                new_mean,
                new_usage,
            )

        init = (flat, jnp.zeros_like(flat))
        (_, quant_sum), (indices, commits, cbs, cnts, means, usages) = jax.lax.scan(
            level_step,
            init,
            (
                state.codebooks,
                state.ema_counts,
                state.ema_means,
                state.usage,
                K,
                size_mask,
                level_ids,
            ),
        )

        # straight-through: gradient flows to the encoder through x
        x_q = flat + jax.lax.stop_gradient(quant_sum - flat)
        x_q = x_q.reshape(B, L, D)

        w = level_w * (level_ids < codebook_n)
        commit_loss = self.commitment_weight * jnp.sum(commits * level_w) / jnp.maximum(
            jnp.sum(w), 1.0
        )

        indices = indices.reshape(nq, B, L).transpose(1, 2, 0)  # (B, L, nq)
        new_state = state.replace(
            codebooks=cbs, ema_counts=cnts, ema_means=means, usage=usages
        )
        return x_q, indices, commit_loss, new_state

    # ---- API parity helpers ------------------------------------------------
    def dequantize(self, state: QuantizerState, indices, level: Optional[int] = None):
        """indices (B, L) for one level, or (B, L, n) summed across the first
        n <= num_quantizers levels (reference: quantizers[i].dequantize at
        networks/vae.py:333). Accepting n < num_quantizers decodes a
        bitrate-truncated stream — RVQ levels are a residual cascade, so the
        first-n sum is exactly the codebook_n-dropout reconstruction."""
        if level is not None:
            return state.codebooks[level][indices]
        n = indices.shape[-1]
        assert n <= self.num_quantizers, (
            f"stream has {n} levels, quantizer only {self.num_quantizers}"
        )
        out = 0.0
        for q in range(n):
            out = out + state.codebooks[q][indices[..., q]]
        return out

    def codebook_perplexity(self, state: QuantizerState) -> np.ndarray:
        """Per-level usage perplexity exp(H[p]) where p is the (EMA) usage
        distribution over live entries — the effective number of codewords in
        play. log2(perplexity) summed over levels gives an effective bits/
        frame estimate, the honest counterpart of the nominal
        sum(log2(codebook_size)) bitrate when entries are dead (VERDICT r3
        weak #4: 50-60% stale at deep levels overstated the 4 kbps claim)."""
        usage = np.asarray(state.usage, dtype=np.float64) * self._size_mask()
        out = np.zeros(self.num_quantizers)
        for q in range(self.num_quantizers):
            p = usage[q]
            total = p.sum()
            if total <= 0:
                out[q] = 1.0
                continue
            p = p / total
            nz = p[p > 0]
            out[q] = float(np.exp(-(nz * np.log(nz)).sum()))
        return out

    def entropy_priors(self, state: QuantizerState) -> list:
        """Per-level integer frequency tables for entropy-coded bitstreams
        (entropy.py): the codebook-usage EMA quantized deterministically, so
        an encoder and a decoder holding the same snapshot derive identical
        range-coder seeds with no table shipped in the file. Returns one
        (codebook_sizes[q],) int64 array per level."""
        from audio_generation_tpu.entropy import quantize_priors

        usage = np.asarray(state.usage, dtype=np.float64)
        return [
            quantize_priors(usage[q, : self.codebook_sizes[q]])
            for q in range(self.num_quantizers)
        ]

    def get_stale_clusters(self, state: QuantizerState):
        """Per-quantizer count of codebook entries with (EMA) usage below
        threshold (reference API: networks/training.py:435,461)."""
        stale = (np.asarray(state.usage) < self.stale_threshold) & self._size_mask()
        return [int(s.sum()) for s in stale]

    def update_cutoff(self, state: QuantizerState, new_cutoff=None, ratio=None) -> QuantizerState:
        """Set or scale the SOM annealing knob (reference:
        networks/vae.py:350-351; scaled x0.95/epoch at training.py:454)."""
        if new_cutoff is not None:
            cutoff = jnp.asarray(new_cutoff, dtype=jnp.float32)
        elif ratio is not None:
            cutoff = state.cutoff * ratio
        else:
            cutoff = state.cutoff
        return state.replace(cutoff=cutoff)

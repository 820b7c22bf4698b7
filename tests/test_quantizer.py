"""RVQ: index determinism, residual algebra, EMA/SOM update laws, dropout."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_generation_tpu.models.quantizer import QuantizerState, ResidualQuantizer


def make_q(**kw):
    defaults = dict(
        num_quantizers=4,
        dim=8,
        codebook_sizes=16,
        quantizer_class="ema",
        use_som=False,
    )
    defaults.update(kw)
    return ResidualQuantizer(**defaults)


def test_indices_deterministic_and_nearest(rng):
    q = make_q()
    state = q.init_state(jax.random.key(0))
    x = jnp.asarray(rng.normal(size=(2, 10, 8)), dtype=jnp.float32)
    xq1, idx1, loss1, _ = q(state, x)
    xq2, idx2, loss2, _ = q(state, x)
    np.testing.assert_array_equal(np.asarray(idx1), np.asarray(idx2))
    assert idx1.shape == (2, 10, 4)  # (B, L, nq) — reference layout utils.py:249

    # level-0 indices are true nearest neighbors (numpy check)
    flat = np.asarray(x).reshape(-1, 8)
    cb = np.asarray(state.codebooks[0])
    d = ((flat[:, None] - cb[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx1)[..., 0].reshape(-1), d.argmin(-1))


def test_residual_cascade_reduces_error(rng):
    q = make_q(num_quantizers=8, codebook_sizes=64)
    state = q.init_state(jax.random.key(1))
    x = jnp.asarray(rng.normal(size=(1, 50, 8)), dtype=jnp.float32)
    errs = []
    for n in [1, 2, 4, 8]:
        xq, _, _, _ = q(state, x, codebook_n=n)
        errs.append(float(jnp.mean((x - xq) ** 2)))
    assert errs[0] > errs[1] > errs[2] > errs[3]


def test_quantized_equals_dequantized_indices(rng):
    q = make_q()
    state = q.init_state(jax.random.key(2))
    x = jnp.asarray(rng.normal(size=(1, 6, 8)), dtype=jnp.float32)
    xq, idx, _, _ = q(state, x)
    recon = q.dequantize(state, idx)
    np.testing.assert_allclose(np.asarray(xq), np.asarray(recon), rtol=1e-5, atol=1e-6)


def test_codebook_dropout_masks_levels(rng):
    q = make_q()
    state = q.init_state(jax.random.key(3))
    x = jnp.asarray(rng.normal(size=(1, 6, 8)), dtype=jnp.float32)
    _, idx2, _, _ = q(state, x, codebook_n=2)
    # inactive levels emit index 0
    assert (np.asarray(idx2)[..., 2:] == 0).all()
    # active levels match full run
    _, idx4, _, _ = q(state, x, codebook_n=4)
    np.testing.assert_array_equal(np.asarray(idx2)[..., :2], np.asarray(idx4)[..., :2])


def test_ema_update_moves_codebook_toward_data(rng):
    q = make_q(num_quantizers=1, ema_decay=0.5)
    state = q.init_state(jax.random.key(4))
    target = np.zeros((1, 64, 8), dtype=np.float32)
    target[..., 0] = 3.0  # all data at one point
    x = jnp.asarray(target)
    for _ in range(30):
        _, idx, _, state = q(state, x, update_codebook=True)
    winner = int(np.asarray(idx)[0, 0, 0])
    cb = np.asarray(state.codebooks[0, winner])
    np.testing.assert_allclose(cb, target[0, 0], atol=1e-2)


def test_no_update_without_flag(rng):
    q = make_q()
    state = q.init_state(jax.random.key(5))
    x = jnp.asarray(rng.normal(size=(2, 10, 8)), dtype=jnp.float32)
    _, _, _, s2 = q(state, x, update_codebook=False)
    np.testing.assert_array_equal(np.asarray(state.codebooks), np.asarray(s2.codebooks))
    np.testing.assert_array_equal(np.asarray(state.ema_counts), np.asarray(s2.ema_counts))


def test_base_kohonen_update(rng):
    q = make_q(quantizer_class="base", num_quantizers=1, codebook_lr=1.0)
    state = q.init_state(jax.random.key(6))
    x = jnp.asarray(np.full((1, 32, 8), 2.0, dtype=np.float32))
    _, idx, _, s2 = q(state, x, update_codebook=True)
    winner = int(np.asarray(idx)[0, 0, 0])
    # lr=1, identity kernel: winner jumps exactly to the batch mean
    np.testing.assert_allclose(np.asarray(s2.codebooks[0, winner]), 2.0, atol=1e-5)


def test_som_neighborhood_update_locality(rng):
    """With a SOM 'hard' kernel, grid-neighbors of the winner move; far
    entries don't (the SOM update-locality law)."""
    q = make_q(
        quantizer_class="base",
        num_quantizers=1,
        codebook_sizes=16,  # 4x4 grid
        use_som=True,
        som_kernel_type="hard",
        vq_cutoff_freq=0.5,  # radius = 0.5 * 4 / 2 = 1 -> direct neighbors
        codebook_lr=0.5,
    )
    state = q.init_state(jax.random.key(7))
    x = jnp.asarray(np.full((1, 8, 8), 5.0, dtype=np.float32))
    _, idx, _, s2 = q(state, x, update_codebook=True)
    winner = int(np.asarray(idx)[0, 0, 0])
    h, w = 4, 4
    wi, wj = divmod(winner, w)
    moved = np.abs(np.asarray(s2.codebooks[0]) - np.asarray(state.codebooks[0])).sum(-1) > 1e-6
    for e in range(16):
        ei, ej = divmod(e, w)
        grid_d2 = (ei - wi) ** 2 + (ej - wj) ** 2
        if grid_d2 <= 1:
            assert moved[e], f"neighbor {e} should move"
        elif grid_d2 > 2:
            assert not moved[e], f"far entry {e} should not move"


def test_cutoff_anneal_shrinks_neighborhood():
    q = make_q(
        quantizer_class="base",
        num_quantizers=1,
        codebook_sizes=16,
        use_som=True,
        som_kernel_type="hard",
        vq_cutoff_freq=1.0,
    )
    state = q.init_state(jax.random.key(8))
    K_wide = np.asarray(q._neighborhood_kernel(state.cutoff))
    state = q.update_cutoff(state, ratio=0.05)
    K_narrow = np.asarray(q._neighborhood_kernel(state.cutoff))
    assert K_wide.sum() > K_narrow.sum()
    np.testing.assert_array_equal(K_narrow[0], np.eye(16))  # annealed to plain VQ


def test_stale_clusters(rng):
    q = make_q(num_quantizers=2, codebook_sizes=8, stale_threshold=1e-2)
    state = q.init_state(jax.random.key(9))
    # force all usage to zero except through calls
    state = state.replace(usage=jnp.zeros_like(state.usage))
    assert q.get_stale_clusters(state) == [8, 8]
    x = jnp.asarray(rng.normal(size=(4, 50, 8)), dtype=jnp.float32)
    for _ in range(5):
        _, _, _, state = q(state, x, update_codebook=True)
    stale = q.get_stale_clusters(state)
    assert all(s < 8 for s in stale)


def test_commit_loss_gradient_flows_to_input(rng):
    q = make_q()
    state = q.init_state(jax.random.key(10))
    x = jnp.asarray(rng.normal(size=(1, 5, 8)), dtype=jnp.float32)

    def loss_fn(x):
        xq, _, commit, _ = q(state, x)
        return jnp.sum(xq**2) + commit

    g = jax.grad(loss_fn)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_straight_through_passes_decoder_grad(rng):
    q = make_q()
    state = q.init_state(jax.random.key(11))
    x = jnp.asarray(rng.normal(size=(1, 5, 8)), dtype=jnp.float32)

    def loss_fn(x):
        xq, _, _, _ = q(state, x)
        return jnp.sum(xq * 3.0)

    g = np.asarray(jax.grad(loss_fn)(x))
    np.testing.assert_allclose(g, 3.0, rtol=1e-6)  # identity passthrough


def test_per_level_codebook_sizes(rng):
    q = make_q(num_quantizers=3, codebook_sizes=[16, 8, 4])
    state = q.init_state(jax.random.key(12))
    x = jnp.asarray(rng.normal(size=(2, 20, 8)), dtype=jnp.float32)
    _, idx, _, _ = q(state, x)
    idx = np.asarray(idx)
    assert idx[..., 0].max() < 16
    assert idx[..., 1].max() < 8
    assert idx[..., 2].max() < 4


def test_jit_with_traced_args(rng):
    q = make_q()
    state = q.init_state(jax.random.key(13))
    x = jnp.asarray(rng.normal(size=(1, 10, 8)), dtype=jnp.float32)

    @jax.jit
    def step(state, x, n, upd):
        return q(state, x, codebook_n=n, update_codebook=upd)

    xq, idx, loss, s2 = step(state, x, jnp.int32(2), jnp.asarray(True))
    xq2, idx2, loss2, _ = step(state, x, jnp.int32(4), jnp.asarray(False))
    assert not np.array_equal(np.asarray(idx), np.asarray(idx2))


def test_som_grid_property():
    q = make_q(codebook_sizes=512, use_som=True)
    h, w = q.som_grid
    assert h * w == 512


def make_diff_som(**kw):
    defaults = dict(
        quantizer_class="ema",
        num_quantizers=2,
        dim=8,
        codebook_sizes=16,  # 4x4 grid
        use_som=True,
        som_kernel_type="gaussian",
        differentiable_som=True,
        som_temperature=0.5,
        vq_cutoff_freq=1.0,
    )
    defaults.update(kw)
    return ResidualQuantizer(**defaults)


def test_differentiable_som_gradient_flows_through_assignments(rng):
    """The soft-SOM commit loss must carry gradient through the assignment
    probabilities — its input-gradient differs from the hard-VQ commit
    gradient on the same state (arXiv:2302.07950; BASELINE config #5)."""
    q_soft = make_diff_som()
    q_hard = make_diff_som(differentiable_som=False)
    state = q_soft.init_state(jax.random.key(21))
    x = jnp.asarray(rng.normal(size=(1, 12, 8)), dtype=jnp.float32)

    def commit_of(q):
        def f(x):
            _, _, commit, _ = q(state, x)
            return commit
        return jax.grad(f)(x)

    g_soft = np.asarray(commit_of(q_soft))
    g_hard = np.asarray(commit_of(q_hard))
    assert np.isfinite(g_soft).all()
    assert np.abs(g_soft).sum() > 0
    assert not np.allclose(g_soft, g_hard)


def test_differentiable_som_codes_stay_hard_argmin(rng):
    """Soft assignments shape losses/updates; emitted CODES remain the hard
    nearest neighbor (the codec bitstream is unchanged by the flag)."""
    q_soft = make_diff_som()
    q_hard = make_diff_som(differentiable_som=False)
    state = q_soft.init_state(jax.random.key(22))
    x = jnp.asarray(rng.normal(size=(2, 10, 8)), dtype=jnp.float32)
    _, idx_soft, _, _ = q_soft(state, x)
    _, idx_hard, _, _ = q_hard(state, x)
    np.testing.assert_array_equal(np.asarray(idx_soft), np.asarray(idx_hard))


@pytest.mark.slow
def test_differentiable_som_update_trains_and_anneals(rng):
    """The soft neighborhood update must (a) pull codebooks toward the data
    and (b) sharpen toward plain VQ as the cutoff anneals x0.95/epoch."""
    q = make_diff_som(num_quantizers=1, ema_decay=0.5)
    state = q.init_state(jax.random.key(23))
    target = np.zeros((1, 64, 8), dtype=np.float32)
    target[..., 0] = 3.0
    x = jnp.asarray(target)
    err0 = None
    for step in range(40):
        xq, _, _, state = q(state, x, update_codebook=True)
        state = q.update_cutoff(state, ratio=0.95)
        if step == 0:
            err0 = float(jnp.mean((x - xq) ** 2))
    xq, _, _, _ = q(state, x)
    err1 = float(jnp.mean((x - xq) ** 2))
    assert err1 < err0
    # annealed kernel is (near-)diagonal: plain-VQ limit
    K = np.asarray(q._neighborhood_kernel(state.cutoff))[0]
    off_diag = K - np.diag(np.diag(K))
    assert off_diag.max() < 0.1


def test_prioritize_early_weighting(rng):
    """prioritize_early weights early-level commit losses more heavily
    (reference flag plumbed at networks/training.py:264,325-328)."""
    q = make_q()
    state = q.init_state(jax.random.key(20))
    x = jnp.asarray(rng.normal(size=(1, 20, 8)), dtype=jnp.float32)
    _, _, c_plain, _ = q(state, x, prioritize_early=False)
    _, _, c_early, _ = q(state, x, prioritize_early=True)
    # both positive, and the weighting changes the value (early levels carry
    # the largest residuals, so weighting them more raises the mean)
    assert float(c_plain) > 0 and float(c_early) > 0
    assert not np.isclose(float(c_plain), float(c_early))
    assert float(c_early) > float(c_plain)


def test_static_inference_path_bit_identical_to_traced(rng):
    """The structurally update-free inference path (static update=False) must
    be BIT-identical to the traced-flag path evaluated with update=False —
    same search math, same precision, same scan order."""
    for q in [make_q(), make_q(use_som=True, som_kernel_type="hard"), make_diff_som()]:
        state = q.init_state(jax.random.key(30))
        x = jnp.asarray(rng.normal(size=(2, 9, 8)), dtype=jnp.float32)
        xq_s, idx_s, c_s, st_s = jax.jit(lambda s, x: q(s, x, update_codebook=False))(state, x)

        @jax.jit
        def traced(s, x, flag):
            return q(s, x, update_codebook=flag)

        xq_t, idx_t, c_t, st_t = traced(state, x, jnp.asarray(False))
        np.testing.assert_array_equal(np.asarray(xq_s), np.asarray(xq_t))
        np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_t))
        np.testing.assert_array_equal(np.asarray(c_s), np.asarray(c_t))
        # static path must not touch state at all
        np.testing.assert_array_equal(np.asarray(st_s.codebooks), np.asarray(state.codebooks))
        np.testing.assert_array_equal(np.asarray(st_s.usage), np.asarray(state.usage))
        np.testing.assert_array_equal(np.asarray(st_s.ema_counts), np.asarray(state.ema_counts))


# ---- dead-entry reactivation (restart_stale; VERDICT r3 task 4) ---------- #

def _state_with_dead_entry(q, key=0, dead=(0, 5)):
    """Init state with entry `dead` forced far away + usage below threshold."""
    state = q.init_state(jax.random.key(key))
    lvl, ent = dead
    cb = np.array(state.codebooks)
    cb[lvl, ent] = 1e3  # never the nearest neighbor for unit-scale data
    usage = np.array(state.usage)
    usage[lvl, ent] = q.stale_threshold / 10.0
    return state.replace(
        codebooks=jnp.asarray(cb),
        ema_means=jnp.asarray(cb) + 0.0,
        usage=jnp.asarray(usage),
    )


def test_restart_reseeds_stale_entry_from_worst_residual(rng):
    q = make_q(restart_stale=True)
    state = _state_with_dead_entry(q, dead=(0, 5))
    x = jnp.asarray(rng.normal(size=(2, 10, 8)), dtype=jnp.float32)
    _, _, _, new_state = q(state, x, update_codebook=True)

    # the stale entry was overwritten from the worst-quantized input rows
    # (level 0: residual == the input itself). Candidates are assigned by
    # entry position — entry 5 receives the 6th-worst row — so simultaneous
    # restarts get DISTINCT seeds.
    flat = np.asarray(x).reshape(-1, 8)
    cb0 = np.asarray(state.codebooks[0])
    d = ((flat[:, None] - cb0[None]) ** 2).sum(-1)
    worst = flat[np.argsort(-d.min(-1))[5]]
    np.testing.assert_allclose(
        np.asarray(new_state.codebooks[0, 5]), worst, rtol=1e-5, atol=1e-5
    )
    # usage reset above threshold; EMA invariant means/counts == codebook
    assert float(new_state.usage[0, 5]) == q.restart_usage_reset
    np.testing.assert_allclose(
        np.asarray(new_state.ema_means[0, 5]), worst, rtol=1e-5, atol=1e-5
    )
    assert float(new_state.ema_counts[0, 5]) == 1.0


def test_restart_off_is_reference_parity(rng):
    state_args = dict(key=4, dead=(1, 3))
    x = jnp.asarray(rng.normal(size=(2, 10, 8)), dtype=jnp.float32)
    q_off = make_q(restart_stale=False)
    q_on = make_q(restart_stale=True)
    s_off = _state_with_dead_entry(q_off, **state_args)
    s_on = _state_with_dead_entry(q_on, **state_args)

    out_off = q_off(s_off, x, update_codebook=True)
    out_on = q_on(s_on, x, update_codebook=True)
    # quantized output / indices / commit identical (restart only affects
    # state seen by FUTURE steps); dead entry only moves when restart is on
    np.testing.assert_array_equal(np.asarray(out_off[1]), np.asarray(out_on[1]))
    np.testing.assert_allclose(
        np.asarray(out_off[0]), np.asarray(out_on[0]), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(  # untouched up to Laplace smoothing (EMA
        # means-over-counts keeps an unhit entry in place)
        float(out_off[3].codebooks[1, 3, 0]), 1e3, rtol=1e-2
    )
    assert abs(float(out_on[3].codebooks[1, 3, 0])) < 50.0  # re-seeded


def test_restart_not_triggered_for_live_entries(rng):
    q = make_q(restart_stale=True)
    state = q.init_state(jax.random.key(5))  # all usage = 1.0 (healthy)
    x = jnp.asarray(rng.normal(size=(2, 10, 8)), dtype=jnp.float32)
    q_off = make_q(restart_stale=False)
    s_new_on = q(state, x, update_codebook=True)[3]
    s_new_off = q_off(state, x, update_codebook=True)[3]
    np.testing.assert_allclose(
        np.asarray(s_new_on.codebooks), np.asarray(s_new_off.codebooks),
        rtol=1e-6, atol=1e-6,
    )


def test_restart_inactive_without_update_flag(rng):
    q = make_q(restart_stale=True)
    state = _state_with_dead_entry(q, key=6, dead=(0, 7))
    x = jnp.asarray(rng.normal(size=(2, 10, 8)), dtype=jnp.float32)
    _, _, _, s_new = q(state, x, update_codebook=False)
    # update_codebook=False may be traced OR static; use a traced flag so the
    # training graph (where restart lives) is the one exercised
    _, _, _, s_new_traced = jax.jit(
        lambda s, xx, u: q(s, xx, update_codebook=u)
    )(state, x, jnp.asarray(False))
    assert float(s_new.codebooks[0, 7, 0]) == 1e3  # untouched (static path)
    assert float(s_new_traced.codebooks[0, 7, 0]) == 1e3  # untouched (traced)


def test_codebook_perplexity_reporting():
    q = make_q(num_quantizers=2, codebook_sizes=16)
    state = q.init_state(jax.random.key(7))
    # level 0: uniform usage -> perplexity == 16; level 1: one live entry -> 1
    usage = np.zeros((2, 16), dtype=np.float32)
    usage[0, :] = 1.0
    usage[1, 0] = 1.0
    perp = q.codebook_perplexity(state.replace(usage=jnp.asarray(usage)))
    np.testing.assert_allclose(perp, [16.0, 1.0], rtol=1e-6)

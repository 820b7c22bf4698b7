"""Trainer integration: full GAN train step, resume, augmentations, config."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_generation_tpu.config import ExperimentConfig


def tiny_config(tmp_path, gan=True, **overrides):
    d = {
        "experiment_name": "t",
        "save_path_root": str(tmp_path) + "/",
        "dataset": "synthetic",
        "sample_rate": 24000,
        "use_discriminator": gan,
        "scratch_train": True,
        "lr": 1e-3,
        "scheduler_warmup": 0,  # warmup starts at LR 0 — tests want step 1 to move params
        "scheduler_total_iter": 100,
        "vae_args": {
            "in_channels": 1,
            "num_quantizers": 4,
            "codebook_size": 32,
            "codebook_dim": 16,
            "first_block_channels": 4,
            "n_layers_per_block": 2,
            "strides": [2, 3, 4],
            "wavelet_decoders": [False, True, False],
            "input_format": "n c l",
            "use_som": True,
            "som_kernel_type": "hard",
            "vq_type": "ema",
        },
        "trainer_args": {
            "batch_size": 2,
            "accumulation_steps": 2,
            "use_one_discriminator": True,
            "mini_epoch_length": 2,
            "steps_per_epoch": 8,
            "save_every": 1,
            "spec_windows": [32, 64],
        },
        "train_run_args": {
            "epochs": 1,
            "sparsity_weight": 0.01,
        },
    }
    d.update(overrides)
    return ExperimentConfig.from_dict(d)


@pytest.fixture(scope="module")
def tiny_dataset():
    from audio_generation_tpu.data import SyntheticAudio

    return SyntheticAudio(length=24 * 80, sample_rate=24000, n_items=16)


def small_disc_bank():
    """A scaled-down adversary bank so CPU test compiles stay fast; the full
    bank's architecture is covered by tests/test_discriminators.py."""
    from audio_generation_tpu.models.discriminators import (
        STFTDiscriminator,
        WaveFormDiscriminator,
    )

    modules = [
        WaveFormDiscriminator(n_blocks=1, channel_sizes=(4, 8, 8, 8, 8, 8, 8),
                              groups=(1, 2, 2, 2, 2, 1, 1)),
        STFTDiscriminator(win_length=128, first_channel_size=4),
        STFTDiscriminator(win_length=256, first_channel_size=4),
    ]
    names = ["waveform_discriminator", "stft_discriminator_128", "stft_discriminator_256"]
    return modules, names


def make_trainer(tmp_path, tiny_dataset, gan=True, **overrides):
    from audio_generation_tpu.train.trainer import Trainer

    cfg = tiny_config(tmp_path, gan=gan, **overrides)
    tr = Trainer(
        cfg,
        dataset=tiny_dataset,
        data_sample_rate=24000,
        discriminators=small_disc_bank() if gan else None,
    )
    tr.crop_size = 24 * 256  # small but long enough for the VALID-conv stack
    tr.state = tr._init_state(jax.random.key(0))
    return tr


@pytest.mark.slow
def test_full_gan_step(tmp_path, tiny_dataset):
    tr = make_trainer(tmp_path, tiny_dataset)
    data_iter = tr._data_iterator()
    params_before = jax.tree_util.tree_leaves(tr.state.params)[0].copy()
    tr.mini_epoch(data_iter)
    params_after = jax.tree_util.tree_leaves(tr.state.params)[0]
    assert not np.allclose(np.asarray(params_before), np.asarray(params_after))
    assert int(tr.state.step) == 1
    assert tr.mini_epoch_i == 1
    assert tr.loss_breakdown["generator"]  # ledger populated
    assert tr.d_energies is not None and len(tr.d_energies) == len(tr.discriminators)


def test_discriminator_sampling_and_codebook_options(tmp_path, tiny_dataset):
    tr = make_trainer(tmp_path, tiny_dataset)
    # 3 discriminators, nq=4: [nq] + [nq_per_d*(i+1)...] + [nq]
    # (pattern from training.py:196-199)
    assert tr.codebook_options == [4, 2, 4]
    active, codebook_n = tr._pick_discriminator()
    assert len(active) == 1
    assert 1 <= codebook_n <= 4


def test_non_gan_training(tmp_path, tiny_dataset):
    tr = make_trainer(tmp_path, tiny_dataset, gan=False)
    data_iter = tr._data_iterator()
    tr.mini_epoch(data_iter)
    assert int(tr.state.step) == 1
    active, codebook_n = tr._pick_discriminator()
    assert active == ()
    assert 2 <= codebook_n <= 4


@pytest.mark.slow
def test_checkpoint_resume(tmp_path, tiny_dataset):
    tr = make_trainer(tmp_path, tiny_dataset)
    data_iter = tr._data_iterator()
    tr.mini_epoch(data_iter)
    tr.epoch = 3
    tr.save_state()

    tr2 = make_trainer(tmp_path, tiny_dataset)
    tr2.config.scratch_train = False
    tr2._maybe_resume()
    assert tr2.epoch == 3
    assert int(tr2.state.step) == int(tr.state.step)
    a = jax.tree_util.tree_leaves(tr.state.params)[0]
    b = jax.tree_util.tree_leaves(tr2.state.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_cutoff_decay_and_stale_report(tmp_path, tiny_dataset, capsys):
    tr = make_trainer(tmp_path, tiny_dataset)
    before = float(tr.state.codebook["state"].cutoff)
    tr.train(epochs=1)
    after = float(tr.state.codebook["state"].cutoff)
    np.testing.assert_allclose(after, before * 0.95, rtol=1e-5)
    out = capsys.readouterr().out
    assert "stale cluster change" in out
    assert "Loss breakdown" in out
    # artifacts
    assert any(f.endswith("_sample.wav") for f in os.listdir(tr.workdir))


@pytest.mark.slow
def test_sample_data_and_reconstruct(tmp_path, tiny_dataset):
    tr = make_trainer(tmp_path, tiny_dataset)
    y = tr.sample_data(length_multiple=2)
    assert y.shape == (tr.crop_size * 2,)
    wave = np.asarray(tiny_dataset[0][0][0])
    rec = tr.reconstruct(wave)
    assert rec.shape[0] == (len(wave) // 24) * 24


@pytest.mark.slow
def test_train_new_quantizer_energy(tmp_path, tiny_dataset):
    tr = make_trainer(tmp_path, tiny_dataset, gan=False)
    tr.train_new_quantizer(
        bottleneck="energy",
        energy_kwargs={"dim": 16, "n_heads": 2, "head_dim": 8, "n_iters": 2},
        epochs=1,
    )
    assert tr.model.bottleneck == "energy"
    assert int(tr.state.step) > 0


@pytest.mark.slow
def test_nan_watchdog(tmp_path, tiny_dataset):
    tr = make_trainer(tmp_path, tiny_dataset, gan=False)
    # poison the params to force NaNs
    tr.state = tr.state.replace(
        params=jax.tree_util.tree_map(lambda p: p * np.nan, tr.state.params)
    )
    with pytest.raises(ValueError, match="NaN loss"):
        tr.mini_epoch(tr._data_iterator())


@pytest.mark.slow
def test_grad_accum_carry_matches_stacked_sum(tmp_path, tiny_dataset):
    """The in-scan carry accumulation must equal the naive stacked-grads sum
    (the reference's backward()-accumulates semantics, training.py:296-303)."""
    import optax

    tr = make_trainer(tmp_path, tiny_dataset, gan=True)
    batch = jnp.asarray(next(tr._data_iterator()))
    active = (1,)
    codebook_n = jnp.asarray(2, jnp.int32)
    sb, cfg, state = tr.steps, tr.cfg, tr.state

    def manual(state, batch, codebook_n):
        # mirror step_fn's rng/flag derivation exactly
        rng, sub = jax.random.split(state.rng)
        accum = batch.shape[0]
        rngs = jax.random.split(sub, accum)
        flags = (jnp.arange(accum) % cfg.codebook_update_step) == 0
        d_params_list = tuple(state.discriminators[di].params for di in active)
        inner = (state.codebook, state.discriminators, codebook_n)
        g_stack, d_stack = [], []
        for i in range(accum):
            inner, (g, d, _m, _y, _x) = sb.micro_batch(
                active, state.params, d_params_list, inner, (batch[i], rngs[i], flags[i])
            )
            g_stack.append(g)
            d_stack.append(d)
        g_sum = jax.tree_util.tree_map(lambda *gs: sum(gs), *g_stack)
        updates, _ = sb.gen_tx.update(g_sum, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        d_sums = jax.tree_util.tree_map(lambda *gs: sum(gs), *d_stack)
        codebook, disc_states, _ = inner
        new_d = []
        for pi, di in enumerate(active):
            ds = disc_states[di]
            d_up, _ = sb.disc_tx.update(d_sums[pi], ds.opt_state, ds.params)
            new_d.append(optax.apply_updates(ds.params, d_up))
        return params, new_d, codebook

    m_params, m_disc, m_codebook = jax.jit(manual)(state, batch, codebook_n)
    new_state, _metrics, _sample = sb.build(active)(state, batch, codebook_n)

    for a, b in zip(
        jax.tree_util.tree_leaves(m_params), jax.tree_util.tree_leaves(new_state.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(m_disc[0]),
        jax.tree_util.tree_leaves(new_state.discriminators[1].params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(m_codebook["state"].codebooks),
        np.asarray(new_state.codebook["state"].codebooks),
        rtol=2e-4, atol=1e-5,
    )


def test_config_yaml_roundtrip(tmp_path):
    cfg = tiny_config(tmp_path)
    import yaml

    path = os.path.join(tmp_path, "cfg.yml")
    with open(path, "w") as f:
        yaml.safe_dump(
            {
                "experiment_name": "yamltest",
                "dataset": "synthetic",
                "sample_rate": 24000,
                "use_discriminator": False,
                "lr": 0.0005,
                "vae_args": {"num_quantizers": 10, "codebook_size": 512, "vq_type": "base"},
                "trainer_args": {"batch_size": 4, "accumulation_steps": 32},
                "train_run_args": {"epochs": 10, "sparsity_weight": 0},
            },
            f,
        )
    loaded = ExperimentConfig.from_yaml(path)
    assert loaded.vae.num_quantizers == 10
    assert loaded.vae.vq_type == "base"
    assert loaded.trainer.accumulation_steps == 32
    assert loaded.run.epochs == 10
    assert loaded.trainer.model_lr == 0.0005  # top-level lr flows to trainer
    assert loaded.save_path.endswith("yamltest/")


def test_config_rejects_unknown_keys(tmp_path):
    with pytest.raises(ValueError, match="Unknown keys"):
        ExperimentConfig.from_dict({"vae_args": {"not_a_real_arg": 1}})


@pytest.mark.slow
def test_bf16_training_step_stable(tmp_path, tiny_dataset):
    """compute_dtype=bfloat16 (config.py VAEConfig): the full GAN step runs,
    losses stay finite, and params move — the serving-precision training
    path (VERDICT r1 item 9)."""
    cfg = tiny_config(tmp_path)
    cfg.vae.compute_dtype = "bfloat16"
    from audio_generation_tpu.train.trainer import Trainer

    tr = Trainer(
        cfg, dataset=tiny_dataset, data_sample_rate=24000,
        discriminators=small_disc_bank(),
    )
    tr.crop_size = 24 * 256
    tr.state = tr._init_state(jax.random.key(0))
    import jax.numpy as jnp

    assert tr.model.compute_dtype == jnp.bfloat16
    losses: list = []
    data_iter = tr._data_iterator()
    for _ in range(2):
        tr.mini_epoch(data_iter, losses=losses)
    assert losses and np.isfinite(losses).all()
    assert int(tr.state.step) == 2


def test_single_quantizer_codebook_n(tmp_path, tiny_dataset):
    """num_quantizers=1 must not crash the no-GAN codebook_n draw (the
    reference's randint(2, nq+1) at training.py:294 would)."""
    cfg = tiny_config(tmp_path, gan=False)
    cfg.vae.num_quantizers = 1
    from audio_generation_tpu.train.trainer import Trainer

    tr = Trainer(cfg, dataset=tiny_dataset, data_sample_rate=24000)
    for _ in range(5):
        active, codebook_n = tr._pick_discriminator()
        assert active == () and codebook_n == 1


def test_grad_clip_norm_bounds_update():
    """generator_optimizer(clip_norm=c): a pathological gradient (the log-mel
    eps spike observed in CONVERGE_r03) produces a bounded update."""
    import optax

    from audio_generation_tpu.train.schedule import generator_optimizer

    params = {"w": jnp.ones((4, 4))}
    huge = {"w": jnp.full((4, 4), 1e7)}
    tx = generator_optimizer(1e-3, warmup_iter=0, total_iter=100, clip_norm=1.0)
    state = tx.init(params)
    updates, _ = tx.update(huge, state, params)
    clipped_norm = float(optax.global_norm(updates))
    # adam-normalized updates are bounded ~lr regardless, but the clip must
    # also bound the RAW gradient the moments see: apply twice and check the
    # second-moment state stays finite and small
    assert np.isfinite(clipped_norm)

    tx_noclip = generator_optimizer(1e-3, warmup_iter=0, total_iter=100)
    s2 = tx_noclip.init(params)
    _, s2 = tx_noclip.update(huge, s2, params)
    s1 = tx.init(params)
    _, s1 = tx.update(huge, s1, params)
    nu_clip = optax.tree_utils.tree_get(s1, "nu")
    nu_noclip = optax.tree_utils.tree_get(s2, "nu")
    assert float(jnp.max(nu_clip["w"])) < float(jnp.max(nu_noclip["w"])) / 1e6


def test_in_loop_eval_columns_in_metrics(tmp_path, tiny_dataset):
    """Per-epoch held-out evaluation (VERDICT r2 task 6): eval_snr_db /
    eval_si_sdr_db / eval_mel_l1 columns land in metrics.csv, and the eval
    tail is excluded from the training permutation."""
    import csv

    tr = make_trainer(
        tmp_path, tiny_dataset, gan=False,
        trainer_args={
            "batch_size": 2, "accumulation_steps": 1, "mini_epoch_length": 2,
            "spec_windows": [32, 64], "eval_every": 1, "eval_items": 2,
        },
    )
    assert tr.n_eval == 2
    waves = tr.eval_batch()
    assert waves.shape == (2, tr.crop_size)
    tr.train(epochs=1)
    with open(os.path.join(tr.workdir, "metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    cols = rows[0].keys()
    for c in ("eval_snr_db", "eval_si_sdr_db", "eval_mel_l1"):
        assert c in cols
        vals = [r[c] for r in rows if r.get(c)]
        assert vals and all(np.isfinite(float(v)) for v in vals)


def test_gan_loss_run_toggle_gates_discriminators(tmp_path, tiny_dataset):
    """train_run_args.gan_loss is the per-run adversarial toggle (reference:
    train(gan_loss=...), training.py:416-424): with it False, no
    discriminators are built even when use_discriminator is True — it used
    to be validated but never read."""
    from audio_generation_tpu.train.trainer import Trainer

    cfg = tiny_config(tmp_path, gan=True)
    cfg.run.gan_loss = False
    tr = Trainer(cfg, dataset=tiny_dataset, data_sample_rate=24000)
    assert not tr.gan and tr.discriminators == []
    # and the codebook options fall back to the full-bitrate-only choice
    assert tr.codebook_options == [cfg.vae.num_quantizers]


def test_model_lr_knob_reaches_generator_optimizer(tmp_path, tiny_dataset):
    """trainer_args.model_lr must drive the generator optimizer (it used to
    be silently ignored in favor of the top-level lr)."""
    import optax

    from audio_generation_tpu.train.trainer import Trainer

    def peak_lr(tr):
        # probe the schedule far past warmup with a unit gradient
        g = jax.tree_util.tree_map(jnp.ones_like, tr.state.params)
        state = tr.gen_tx.init(tr.state.params)
        # advance past warmup so the schedule sits at its peak
        for _ in range(3):
            upd, state = tr.gen_tx.update(g, state, tr.state.params)
        return max(abs(float(x.max())) for x in jax.tree_util.tree_leaves(upd))

    cfg_hi = tiny_config(tmp_path / "hi", gan=False)
    cfg_hi.trainer.model_lr = 1e-2
    cfg_hi.trainer.grad_clip_norm = None
    tr_hi = Trainer(cfg_hi, dataset=tiny_dataset, data_sample_rate=24000)
    cfg_lo = tiny_config(tmp_path / "lo", gan=False)
    cfg_lo.trainer.model_lr = 1e-4
    cfg_lo.trainer.grad_clip_norm = None
    tr_lo = Trainer(cfg_lo, dataset=tiny_dataset, data_sample_rate=24000)
    ratio = peak_lr(tr_hi) / max(peak_lr(tr_lo), 1e-12)
    assert ratio > 10, f"model_lr not reaching the optimizer (ratio {ratio})"


def test_params_npz_snapshot_roundtrip(tmp_path, rng):
    """save_params_npz/load_params_npz: bit-exact portable snapshot."""
    import jax
    import jax.numpy as jnp
    from audio_generation_tpu.models import CausalVQAE
    from audio_generation_tpu.train.checkpoint import (
        load_params_npz, save_params_npz,
    )

    model = CausalVQAE(
        in_channels=1, n_blocks=2, n_layers_per_block=2,
        first_block_channels=4, num_quantizers=2, codebook_size=16,
        codebook_dim=8, strides=(2, 3), wavelet_decoders=(False, False),
        use_som=False, vq_type="ema",
    )
    x = jnp.zeros((1, 60, 1))
    variables = model.init(jax.random.key(0), x)
    p = str(tmp_path / "snap.npz")
    size = save_params_npz(
        p, variables["params"], variables["codebook"], {"step": 123}
    )
    assert size > 0
    params, codebook, meta = load_params_npz(p)
    assert meta == {"step": 123}
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_flatten_with_path(variables["params"])[0],
               key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_flatten_with_path(params)[0],
               key=lambda t: str(t[0])),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # QuantizerState rebuilt, and loaded variables run the model unchanged
    w = jnp.asarray(rng.normal(size=(1, 60, 1)) * 0.1, jnp.float32)
    (y0, _, i0), _ = model.apply(variables, w, mutable=["codebook"])
    (y1, _, i1), _ = model.apply(
        {"params": params, "codebook": codebook}, w, mutable=["codebook"]
    )
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


def test_params_npz_f16_loads_as_f32(tmp_path):
    """Regression: params_dtype='float16' snapshots must load back as
    float32. load_params_npz computed the upcast but stored the raw f16
    array — training on a transplanted snapshot then ran the optimizer in
    f16 and diverged within 2 steps (caught by the ganft sweep smoke)."""
    import jax
    import jax.numpy as jnp
    from audio_generation_tpu.models import CausalVQAE
    from audio_generation_tpu.train.checkpoint import (
        load_params_npz, save_params_npz,
    )

    model = CausalVQAE(
        in_channels=1, n_blocks=2, n_layers_per_block=2,
        first_block_channels=4, num_quantizers=2, codebook_size=16,
        codebook_dim=8, strides=(2, 3), wavelet_decoders=(False, False),
        use_som=False, vq_type="ema",
    )
    variables = model.init(jax.random.key(0), jnp.zeros((1, 60, 1)))
    p = str(tmp_path / "snap16.npz")
    save_params_npz(p, variables["params"], variables["codebook"],
                    {"step": 7}, params_dtype="float16")
    params, codebook, _ = load_params_npz(p)
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        assert leaf.dtype == np.float32, f"{jax.tree_util.keystr(path)} " \
            f"loaded as {leaf.dtype}"
    for path, leaf in jax.tree_util.tree_flatten_with_path(codebook)[0]:
        assert leaf.dtype != np.float16, jax.tree_util.keystr(path)
    # and the f16 rounding is the only delta vs the f32 originals
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_flatten_with_path(variables["params"])[0],
               key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_flatten_with_path(params)[0],
               key=lambda t: str(t[0])),
    ):
        np.testing.assert_array_equal(
            np.asarray(a).astype(np.float16).astype(np.float32), np.asarray(b)
        )


def test_save_state_force_replaces_mutated_state(tmp_path, rng, tiny_dataset):
    """ADVICE r3: save_state silently dropped a save when a checkpoint
    already existed at the current step (e.g. after a params transplant onto
    a fresh trainer). force=True must replace it; the default skip logs."""
    from audio_generation_tpu.train.trainer import Trainer

    cfg = tiny_config(tmp_path, gan=False)
    tr = Trainer(cfg, dataset=tiny_dataset)
    tr.save_state()  # step-0 checkpoint
    step0 = tr.ckpt.latest_step()
    assert step0 == 0

    # transplant-like mutation at the SAME step
    mutated = jax.tree_util.tree_map(lambda a: a + 1.0, tr.state.params)
    tr.state = tr.state.replace(params=mutated)
    tr.save_state()  # default: skipped (logged), on-disk state unchanged
    restored = tr.ckpt.restore_latest(tr.state)
    a0 = jax.tree_util.tree_leaves(restored[0].params)[0]
    m0 = jax.tree_util.tree_leaves(mutated)[0]
    assert not np.allclose(np.asarray(a0), np.asarray(m0))

    tr.save_state(force=True)  # replace in place
    restored = tr.ckpt.restore_latest(tr.state)
    assert tr.ckpt.latest_step() == 0
    a1 = jax.tree_util.tree_leaves(restored[0].params)[0]
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(m0))


def test_restore_trainer_from_snapshot(tmp_path, tiny_dataset):
    """tools/quality_r04.restore_trainer_from_snapshot: a committed npz
    snapshot repopulates a trainer whose Orbax run dir was wiped (the VM-
    reset recovery path used by seed_ganft and om_demo)."""
    import shutil
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.quality_r04 import restore_trainer_from_snapshot

    from audio_generation_tpu.train.checkpoint import save_params_npz
    from audio_generation_tpu.train.trainer import Trainer

    cfg = tiny_config(tmp_path, gan=False)
    tr = Trainer(cfg, dataset=tiny_dataset)
    # fabricate a "trained" snapshot: shifted params, step 77
    shifted = jax.tree_util.tree_map(
        lambda a: np.asarray(a) + 0.5, jax.device_get(tr.state.params)
    )
    os.makedirs("/tmp/r04_smoke", exist_ok=True)
    snap = "/tmp/r04_smoke/resttest.npz"
    save_params_npz(snap, shifted, jax.device_get(tr.state.codebook),
                    {"step": 77})
    try:
        step = restore_trainer_from_snapshot(tr, "resttest", smoke=True)
        assert step == 77
        got = jax.tree_util.tree_leaves(tr.state.params)[0]
        want = jax.tree_util.tree_leaves(shifted)[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))
        # missing snapshot -> 0, trainer untouched
        assert restore_trainer_from_snapshot(tr, "no_such_cfg", smoke=True) == 0
    finally:
        os.remove(snap)


def test_loss_ledger_routing_pinned_to_step_metrics(tmp_path, tiny_dataset):
    """The EWMA-breakdown group routing must come from StepBuilder's metric
    registry, pinned against the names a real step actually emits (traced
    abstractly — no compile). A rename of any D/G adversarial metric in
    steps.py now fails THIS test loudly instead of silently misfiling the
    attribution ledger (VERDICT r4 weak #7)."""
    tr = make_trainer(tmp_path, tiny_dataset)
    active = (0,)
    step_fn = tr.steps.build(active)
    batch = next(tr._data_iterator())
    _, metrics_shapes, _ = jax.eval_shape(
        step_fn, tr.state, batch, jnp.asarray(2, jnp.int32)
    )
    emitted = set(metrics_shapes.keys())
    name = tr.steps.disc_names[0]
    # the literal naming convention the registry encodes
    assert f"{name}_loss" in emitted and f"{name}_g_loss" in emitted
    groups = {
        n: ("discriminator" if n in tr.steps.discriminator_metrics else "generator")
        for n in emitted
    }
    assert groups[f"{name}_loss"] == "discriminator"
    assert groups[f"{name}_g_loss"] == "generator"
    assert groups["reconstruction_loss"] == "generator"
    assert groups["multispectral_loss"] == "generator"
    # inactive discriminators emit nothing; the registry must not claim any
    # emitted generator-side metric
    claimed = emitted & tr.steps.discriminator_metrics
    assert claimed == {f"{name}_loss"}

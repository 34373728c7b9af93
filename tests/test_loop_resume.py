"""Train-loop behaviors: fault injection crashes at the requested step and a
fresh loop auto-resumes from the checkpoint (SURVEY.md §5 failure-detection
row)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gan_lib_tensorflow_tpu import data, train
from gan_lib_tensorflow_tpu.models import sngan


def _setup():
    g = sngan.ResNetGenerator(channels=(8,), bottom_ch=8, z_dim=4)
    d = sngan.ResNetDiscriminator(channels=(8, 8), downsample=(True, False))
    spec = sngan.make_sngan_spec(g, d, n_critic=1)
    g_optim = optax.adam(1e-3)
    d_optim = optax.adam(1e-3)
    state = train.create_state(
        jax.random.PRNGKey(0),
        lambda r: g.init(r, jnp.zeros((2, 4)), train=False),
        lambda r: d.init(r, jnp.zeros((2, 8, 8, 3))),
        g_optim, d_optim)
    step_fn = train.jit_train_step(spec, g_optim, d_optim)
    src = data.FakeImages(batch_size=4, image_size=8, seed=0)
    return spec, state, step_fn, src


def test_fault_injection_then_auto_resume(tmp_path):
    spec, state, step_fn, src = _setup()
    ckpt_dir = str(tmp_path / "ckpt")

    cfg = train.LoopConfig(total_steps=10, log_every=100, sample_every=10**9,
                           checkpoint_every=3, out_dir=None,
                           fault_inject_step=5)
    ckpt = train.CheckpointManager(ckpt_dir)
    with pytest.raises(RuntimeError, match="fault injected"):
        train.train_loop(state, step_fn, src, spec.n_micro, cfg, ckpt=ckpt)
    ckpt.wait()
    assert ckpt.latest_step() == 3  # step-3 checkpoint survived the crash
    ckpt.close()

    # a fresh process/loop resumes from the checkpoint and finishes
    spec2, state2, step_fn2, src2 = _setup()
    cfg2 = train.LoopConfig(total_steps=10, log_every=100, sample_every=10**9,
                            checkpoint_every=3, out_dir=None)
    ckpt2 = train.CheckpointManager(ckpt_dir)
    final = train.train_loop(state2, step_fn2, src2, spec2.n_micro, cfg2,
                             ckpt=ckpt2)
    assert int(final.step) == 10
    assert ckpt2.latest_step() == 10
    ckpt2.close()


def test_restore_latest_raw_cross_platform_fallback(tmp_path, monkeypatch):
    """A checkpoint whose recorded shardings name devices absent from this
    process (TPU-trained -> CPU eval) restores via shape/dtype metadata onto
    the default local device instead of failing (self-review fix; observed
    driving cli.evaluate against a TPU-trained PGGAN ladder on CPU)."""
    import jax.numpy as jnp
    from gan_lib_tensorflow_tpu.train import CheckpointManager

    cm = CheckpointManager(str(tmp_path / "ckpt"))
    cm.save(5, {"w": jnp.arange(3.0), "step": 5}, wait=True)

    # simulate the cross-platform failure: the sharding-replaying restore
    # raises exactly orbax's device-not-found error once, then delegate
    real_restore = cm._mngr.restore
    state = {"first": True}

    def wrapped(step, args=None):
        if state["first"]:
            state["first"] = False
            raise ValueError(
                "Device TPU v5 lite0 was not found in jax.local_devices().")
        return real_restore(step, args=args)

    monkeypatch.setattr(cm._mngr, "restore", wrapped)
    raw = cm.restore_latest_raw()
    cm.close()
    assert not state["first"]  # fallback path actually ran
    assert int(raw["step"]) == 5
    np.testing.assert_array_equal(np.asarray(raw["w"]), [0.0, 1.0, 2.0])


def test_aux_retry_transient_then_success(monkeypatch):
    """A transient backend fault in an eval/sample pause retries and recovers
    (the exact failure that killed a 100k-step run at 67.5k: tunnel INTERNAL
    error during the periodic eval)."""
    from gan_lib_tensorflow_tpu.train import loop as loop_mod

    monkeypatch.setattr(loop_mod, "_AUX_BACKOFF_S", 0.0)
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise jax.errors.JaxRuntimeError(
                "INTERNAL: http://127.0.0.1:8113/remote_compile: read body: "
                "response body closed before all bytes were read")
        return {"fid": 1.0}

    assert loop_mod._run_aux("eval@100", flaky) == {"fid": 1.0}
    assert calls["n"] == 3


def test_aux_skips_after_persistent_transient(monkeypatch, capsys):
    from gan_lib_tensorflow_tpu.train import loop as loop_mod

    monkeypatch.setattr(loop_mod, "_AUX_BACKOFF_S", 0.0)

    def always_down():
        raise jax.errors.JaxRuntimeError("UNAVAILABLE: backend unreachable")

    assert loop_mod._run_aux("eval@200", always_down) is None
    assert "SKIPPED" in capsys.readouterr().out


def test_aux_reraises_real_errors():
    """Genuine program errors (no transient marker) must still propagate."""
    from gan_lib_tensorflow_tpu.train import loop as loop_mod

    def broken():
        raise jax.errors.JaxRuntimeError("an unrelated shape error")

    with pytest.raises(jax.errors.JaxRuntimeError):
        loop_mod._run_aux("eval@300", broken)


def test_aux_status_prefix_not_substring():
    """A deterministic error merely MENTIONING a status word in its payload is
    not transient (ADVICE r4: 'INTERNAL' anywhere used to match); only a
    status-prefixed line or a tunnel-transport marker is."""
    from gan_lib_tensorflow_tpu.train import loop as loop_mod

    def misleading():
        raise jax.errors.JaxRuntimeError(
            "INVALID_ARGUMENT: op INTERNAL_GATHER has mismatched shapes")

    with pytest.raises(jax.errors.JaxRuntimeError):
        loop_mod._run_aux("eval@400", misleading)
    assert loop_mod._is_transient("INTERNAL: tunnel dropped")
    assert loop_mod._is_transient(
        "Some wrapper line\nUNAVAILABLE: backend unreachable")
    assert not loop_mod._is_transient("ValueError mentioning INTERNAL stuff")


def test_aux_escalates_after_consecutive_skips(monkeypatch, capsys):
    """A persistently failing eval re-raises after N consecutive skipped
    invocations instead of silently disabling evals for the whole run."""
    from gan_lib_tensorflow_tpu.train import loop as loop_mod

    monkeypatch.setattr(loop_mod, "_AUX_BACKOFF_S", 0.0)
    skips = {}

    def always_down():
        raise jax.errors.JaxRuntimeError("UNAVAILABLE: backend unreachable")

    for _ in range(loop_mod._AUX_MAX_CONSECUTIVE_SKIPS - 1):
        assert loop_mod._run_aux("eval@500", always_down,
                                 skip_counts=skips) is None
    with pytest.raises(jax.errors.JaxRuntimeError):
        loop_mod._run_aux("eval@600", always_down, skip_counts=skips)
    # a success in between resets the counter
    skips2 = {}
    loop_mod._run_aux("eval@1", always_down, skip_counts=skips2)
    loop_mod._run_aux("eval@2", lambda: {"ok": 1.0}, skip_counts=skips2)
    assert skips2["eval"] == 0

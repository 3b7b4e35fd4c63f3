import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acezero_tpu.training.loss import ReproLossConfig, dyntanh_weight, repro_loss
from acezero_tpu.training.optim import adamw_init, adamw_update
from acezero_tpu.training.schedule import (
    ScheduleConfig,
    init_schedule,
    schedule_lr,
    schedule_update,
)


# ---------------------------------------------------------------- losses


def test_tanh_loss_value():
    cfg = ReproLossConfig(loss_type="tanh", soft_clamp=50.0)
    errs = jnp.asarray([10.0, 50.0, 100.0])
    got = float(repro_loss(cfg, errs, jnp.ones(3, bool), 0))
    want = 50.0 * (np.tanh(0.2) + np.tanh(1.0) + np.tanh(2.0))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_tanh_loss_respects_mask():
    cfg = ReproLossConfig(loss_type="tanh", soft_clamp=50.0)
    errs = jnp.asarray([10.0, 50.0, 1e9])
    mask = jnp.asarray([True, True, False])
    got = float(repro_loss(cfg, errs, mask, 0))
    want = 50.0 * (np.tanh(0.2) + np.tanh(1.0))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_dyntanh_schedule_anneals():
    cfg = ReproLossConfig(loss_type="dyntanh", soft_clamp=50.0, soft_clamp_min=1.0, total_iterations=1000)
    w0 = float(dyntanh_weight(cfg, jnp.asarray(0)))
    w_half = float(dyntanh_weight(cfg, jnp.asarray(500)))
    w_end = float(dyntanh_weight(cfg, jnp.asarray(1000)))
    assert w0 == pytest.approx(51.0)
    assert w_end == pytest.approx(1.0)
    # circle schedule decays slowly at first
    assert w_half > 0.5 * (w0 + w_end)


def test_l1_variants():
    errs = jnp.asarray([10.0, 100.0])
    mask = jnp.ones(2, bool)
    l1 = float(repro_loss(ReproLossConfig(loss_type="l1", soft_clamp=50.0), errs, mask, 0))
    assert l1 == pytest.approx(10.0)  # pixels above the clamp contribute 0
    l1sqrt = float(repro_loss(ReproLossConfig(loss_type="l1+sqrt", soft_clamp=50.0), errs, mask, 0))
    assert l1sqrt == pytest.approx(10.0 + np.sqrt(50.0 * 100.0))
    l1log = float(repro_loss(ReproLossConfig(loss_type="l1+logl1", soft_clamp=50.0), errs, mask, 0))
    assert l1log == pytest.approx(10.0 + np.log(1 + 50.0 * 100.0))


# -------------------------------------------------------------- schedule


def test_constant_schedule():
    cfg = ScheduleConfig(schedule="constant", learning_rate_min=0.0005)
    st = init_schedule(cfg)
    assert float(schedule_lr(cfg, st, jnp.asarray(0))) == pytest.approx(0.0005)
    assert float(schedule_lr(cfg, st, jnp.asarray(10000))) == pytest.approx(0.0005)


def test_circle_schedule_matches_torch_onecycle():
    torch = pytest.importorskip("torch")
    cfg = ScheduleConfig(schedule="circle", iterations=1000, learning_rate_max=0.005, learning_rate_min=0.0005)
    st = init_schedule(cfg)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=cfg.learning_rate_min)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=cfg.learning_rate_max, total_steps=cfg.iterations, cycle_momentum=False
    )
    torch_lrs = []
    for _ in range(cfg.iterations):
        torch_lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()

    ours = [float(schedule_lr(cfg, st, jnp.asarray(i))) for i in range(0, 1000, 97)]
    for i, lr in zip(range(0, 1000, 97), ours):
        np.testing.assert_allclose(lr, torch_lrs[i], rtol=2e-2), i


def test_1cyclepoly_warmup_and_dynamic_cooldown():
    cfg = ScheduleConfig(
        schedule="1cyclepoly",
        iterations=10000,
        learning_rate_max=0.003,
        learning_rate_min=0.0005,
        warmup_iterations=100,
        warmup_learning_rate=0.0005,
        cooldown_iterations=200,
        cooldown_trigger_percent=0.7,
        cooldown_buffer_size=10,
    )
    st = init_schedule(cfg)
    # warmup ramps from warmup lr to max
    assert float(schedule_lr(cfg, st, jnp.asarray(0))) == pytest.approx(0.0005)
    assert float(schedule_lr(cfg, st, jnp.asarray(50))) == pytest.approx((0.0005 + 0.003) / 2, rel=0.05)
    assert float(schedule_lr(cfg, st, jnp.asarray(100))) == pytest.approx(0.003)

    # feed high inlier stats -> dynamic cooldown triggers once buffer is full
    it = 150
    for k in range(15):
        st = schedule_update(cfg, st, jnp.asarray(it + k), jnp.asarray(0.9))
    assert bool(st.in_cooldown)
    assert int(st.max_iterations) < 10000
    start = int(st.cooldown_start)
    # lr decays linearly to min over cooldown_iterations
    lr_end = float(schedule_lr(cfg, st, jnp.asarray(start + 200)))
    assert lr_end == pytest.approx(0.0005, rel=1e-3)
    lr_mid = float(schedule_lr(cfg, st, jnp.asarray(start + 100)))
    assert 0.0005 < lr_mid < 0.003


def test_1cyclepoly_no_trigger_below_threshold():
    cfg = ScheduleConfig(
        schedule="1cyclepoly", iterations=10000, warmup_iterations=100,
        cooldown_iterations=200, cooldown_trigger_percent=0.7, cooldown_buffer_size=10,
    )
    st = init_schedule(cfg)
    for k in range(50):
        st = schedule_update(cfg, st, jnp.asarray(200 + k), jnp.asarray(0.5))
    assert not bool(st.in_cooldown)
    assert int(st.max_iterations) == 10000


def test_1cyclepoly_duration_trigger():
    cfg = ScheduleConfig(
        schedule="1cyclepoly", iterations=1000, warmup_iterations=100,
        cooldown_iterations=200, cooldown_trigger_percent=0.99,
    )
    st = init_schedule(cfg)
    st = schedule_update(cfg, st, jnp.asarray(800), jnp.asarray(0.0))
    assert bool(st.in_cooldown)
    assert int(st.max_iterations) == 1000


# ---------------------------------------------------------------- adamw


def test_adamw_matches_torch(rng):
    torch = pytest.importorskip("torch")

    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    tgt = rng.normal(size=(4, 3)).astype(np.float32)

    # torch
    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.AdamW([p], lr=0.01)
    for _ in range(25):
        opt.zero_grad()
        loss = ((p - torch.from_numpy(tgt)) ** 2).sum()
        loss.backward()
        opt.step()
    torch_result = p.detach().numpy()

    # ours
    params = {"w": jnp.asarray(w0)}
    state = adamw_init(params)
    loss_fn = lambda pr: jnp.sum((pr["w"] - jnp.asarray(tgt)) ** 2)
    for _ in range(25):
        grads = jax.grad(loss_fn)(params)
        params, state = adamw_update(params, grads, state, jnp.asarray(0.01))

    np.testing.assert_allclose(np.asarray(params["w"]), torch_result, atol=1e-5)


def test_adamw_disabled_is_noop():
    params = {"w": jnp.ones(3)}
    state = adamw_init(params)
    grads = {"w": jnp.ones(3)}
    p2, s2 = adamw_update(params, grads, state, jnp.asarray(0.1), enabled=False)
    np.testing.assert_allclose(np.asarray(p2["w"]), 1.0)
    assert int(s2.step) == 0
    np.testing.assert_allclose(np.asarray(s2.mu["w"]), 0.0)

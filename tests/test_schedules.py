import numpy as np
import pytest

from p2p_bridge_tpu.models.schedules import (
    BridgeSchedule,
    compute_gaussian_product_coef,
    make_beta_schedule,
    space_indices,
)


def test_space_indices_matches_reference():
    # golden values from the reference implementation (p2pb.py:16-40)
    assert space_indices(1000, 11) == [
        0, 100, 200, 300, 400, 500, 599, 699, 799, 899, 999,
    ]
    assert space_indices(10, 1) == [0]
    assert space_indices(5, 5) == [0, 1, 2, 3, 4]
    assert space_indices(1000, 6) == [0, 200, 400, 599, 799, 999]


def test_beta_schedule_formula():
    betas = make_beta_schedule(1000, 1e-4, 2e-2)
    # endpoint values: scale=1 => sqrt-linspace squared
    assert betas[0] == pytest.approx(1e-4)
    assert betas[-1] == pytest.approx(2e-2)
    assert betas.shape == (1000,)
    # timestep rescaling: T=500 => scale=2
    betas500 = make_beta_schedule(500, 1e-4, 2e-2)
    assert betas500[0] == pytest.approx(2e-4)
    assert betas500[-1] == pytest.approx(4e-2)


def test_gaussian_product_coef():
    c1, c2, var = compute_gaussian_product_coef(np.array(1.0), np.array(2.0))
    assert c1 == pytest.approx(4.0 / 5.0)
    assert c2 == pytest.approx(1.0 / 5.0)
    assert var == pytest.approx(4.0 / 5.0)


def test_schedule_buffers_match_numpy_formulas():
    sched = BridgeSchedule.create(
        timesteps=100, beta_start=1e-4, beta_end=3e-4, symmetric=True
    )
    betas = make_beta_schedule(100, 1e-4, 3e-4)
    betas = np.concatenate([betas[:50], np.flip(betas[:50])])
    std_fwd = np.sqrt(np.cumsum(betas))
    std_bwd = np.sqrt(np.flip(np.cumsum(np.flip(betas))))
    np.testing.assert_allclose(sched.betas, betas.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(sched.std_fwd, std_fwd.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(sched.std_bwd, std_bwd.astype(np.float32), rtol=1e-6)
    # gaussian product identities: mu_x0 + mu_x1 == 1
    np.testing.assert_allclose(sched.mu_x0 + sched.mu_x1, 1.0, rtol=1e-5)
    # symmetric bridge: std_sb vanishes at both ends relative to middle
    assert sched.std_sb[0] < sched.std_sb[50]
    assert sched.std_sb[-1] < sched.std_sb[50]


def test_noise_levels():
    sched = BridgeSchedule.create(timesteps=1000, t0=1e-4, T=1.0)
    np.testing.assert_allclose(
        sched.noise_levels,
        np.linspace(1e-4, 1.0, 1000, dtype=np.float32) * 1000,
        rtol=1e-6,
    )


def test_sampler_plan_pairs():
    sched = BridgeSchedule.create(timesteps=1000)
    plan = sched.sampler_plan(sampling_steps=10)
    assert plan.num_steps == 10
    # steps descend; last prev step is 0
    assert plan.steps[0] == 0 and plan.steps[-1] == 999
    assert plan.step_prev[-1] == 0
    assert (plan.step_prev < plan.step_n).all()
    # posterior coefficients: convex combination
    np.testing.assert_allclose(plan.post_mu_x0 + plan.post_mu_xn, 1.0, rtol=1e-5)
    # noise mask: zero only at the final step (prev == 0)
    assert plan.noise_mask[-1] == 0.0
    assert (plan.noise_mask[:-1] == 1.0).all()


def test_loss_weight_pred_noise_is_unit_without_clip():
    sched = BridgeSchedule.create(timesteps=100, objective="pred_noise", snr_clip=False)
    np.testing.assert_allclose(sched.loss_weight, 1.0, rtol=1e-6)

"""Scheduler algebra tests.

The load-bearing property (SURVEY.md §3.5): under the shipped
`scheduler_1.0_1.0` config, DDIM degenerates to `x0 = -model_output` and
`prev_sample = sample`, making extra denoise steps no-ops.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from diffews_tpu.configs import SchedulerConfig
from diffews_tpu.scheduler import DDIMScheduler, DDPMScheduler, inference_timesteps


class TestDegenerateConfig:
    def setup_method(self):
        self.sched = DDIMScheduler(SchedulerConfig.diffews())

    def test_betas_all_one(self):
        assert np.allclose(self.sched.betas, 1.0)
        assert np.allclose(self.sched.alphas_cumprod, 0.0)
        assert self.sched.final_alpha_cumprod == 0.0

    def test_timesteps_single_step(self):
        ts = self.sched.set_timesteps(1)
        assert ts.tolist() == [1]

    def test_timesteps_twenty_steps(self):
        # Matches the comment in the reference pipeline
        # (marigold_pipeline_rgb_latent_noise.py:646-647).
        ts = self.sched.set_timesteps(20)
        assert ts.tolist() == list(range(951, 0, -50))

    def test_x0_is_negated_model_output(self):
        self.sched.set_timesteps(1)
        rng = np.random.default_rng(0)
        sample = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
        out = self.sched.step(v, 1, sample)
        np.testing.assert_allclose(np.asarray(out.pred_original_sample), -np.asarray(v), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out.prev_sample), np.asarray(sample), rtol=1e-6)

    def test_multi_step_is_noop_on_latent(self):
        self.sched.set_timesteps(4)
        rng = np.random.default_rng(1)
        sample = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
        latent = sample
        for t in self.sched.timesteps:
            v = jnp.asarray(rng.normal(size=latent.shape).astype(np.float32))
            out = self.sched.step(v, int(t), latent)
            latent = out.prev_sample
        np.testing.assert_allclose(np.asarray(latent), np.asarray(sample), rtol=1e-6)

    def test_variance_finite(self):
        # The customized window-product variance must not be NaN even though
        # alphas_cumprod == 0 (scheduler_customized.py:169-181).
        self.sched.set_timesteps(1)
        assert np.isfinite(self.sched._variance(1, -999))
        assert self.sched._variance(1, -999) == 0.0


class TestStandardDDIM:
    """Sanity of the general path against closed-form DDIM algebra."""

    def setup_method(self):
        self.cfg = SchedulerConfig(
            beta_start=0.00085,
            beta_end=0.012,
            beta_schedule="scaled_linear",
            clip_sample=False,
            set_alpha_to_one=False,
            steps_offset=1,
            prediction_type="epsilon",
        )
        self.sched = DDIMScheduler(self.cfg)

    def test_deterministic_roundtrip(self):
        # If model_output is the exact noise used by add_noise, one full-range
        # DDIM step recovers x0.
        self.sched.set_timesteps(1)
        t = int(self.sched.timesteps[0])
        rng = np.random.default_rng(2)
        x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
        eps = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
        xt = self.sched.add_noise(x0, eps, t)
        out = self.sched.step(eps, t, xt)
        np.testing.assert_allclose(np.asarray(out.pred_original_sample), np.asarray(x0), atol=1e-4)

    def test_velocity_identity(self):
        # v-prediction: recovering v via get_velocity then stepping yields x0.
        cfg = SchedulerConfig(
            beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
            clip_sample=False, prediction_type="v_prediction", steps_offset=1,
        )
        sched = DDIMScheduler(cfg)
        sched.set_timesteps(1)
        t = int(sched.timesteps[0])
        rng = np.random.default_rng(3)
        x0 = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
        eps = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
        xt = sched.add_noise(x0, eps, t)
        v = sched.get_velocity(x0, eps, t)
        out = sched.step(v, t, xt)
        np.testing.assert_allclose(
            np.asarray(out.pred_original_sample), np.asarray(x0), atol=1e-4
        )

    def test_scaled_linear_power_schedule(self):
        cfg = SchedulerConfig(beta_schedule="scaled_linear_power", power_beta_curve=2.0)
        s = DDIMScheduler(cfg)
        expect = (
            np.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, 1000, dtype=np.float32) ** 2
        )
        np.testing.assert_allclose(s.betas, expect, rtol=1e-6)


def test_leading_spacing_offsets():
    cfg = SchedulerConfig.diffews()
    assert inference_timesteps(cfg, 2).tolist() == [501, 1]
    assert inference_timesteps(cfg, 5).tolist() == [801, 601, 401, 201, 1]


def test_ddpm_degenerate_matches_ddim_x0():
    sched = DDPMScheduler(SchedulerConfig.diffews())
    sched.set_timesteps(1)
    rng = np.random.default_rng(4)
    sample = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 4, 4, 4)).astype(np.float32))
    out = sched.step(v, 1, sample)
    np.testing.assert_allclose(np.asarray(out.pred_original_sample), -np.asarray(v), rtol=1e-6)


def test_config_roundtrip_from_shipped_json():
    d = {
        "_class_name": "DDIMScheduler",
        "beta_end": 1.0,
        "beta_schedule": "scaled_linear",
        "beta_start": 1.0,
        "clip_sample": False,
        "num_train_timesteps": 1000,
        "prediction_type": "v_prediction",
        "set_alpha_to_one": False,
        "steps_offset": 1,
        "timestep_spacing": "leading",
    }
    cfg = SchedulerConfig.from_diffusers_dict(d)
    assert cfg == SchedulerConfig.diffews()

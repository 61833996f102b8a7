"""AOT serving artifacts (`diffews_tpu/serving.py`).

The exported StableHLO blob (+ weights msgpack, passed as call arguments)
must reproduce the live pipeline and serve WITHOUT model code.
The reference has no deployment path beyond its eval script
(`evaluation_util/main_oss.py`), so the contract here is self-defined:
export -> serialize -> deserialize -> call == pipeline.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffews_tpu import checkpoint as C
from diffews_tpu import serving
from diffews_tpu.configs import CLIPTextConfig, SchedulerConfig, UNetConfig, VAEConfig
from diffews_tpu.models import unet, vae
from diffews_tpu.pipeline import DiffewsPipeline


@pytest.fixture(scope="module")
def pipe():
    ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
    bundle = C.PipelineBundle(
        jax.jit(lambda r: unet.init_params(r, ucfg))(jax.random.PRNGKey(0)), ucfg,
        jax.jit(lambda r: vae.init_params(r, vcfg))(jax.random.PRNGKey(1)), vcfg,
        None, CLIPTextConfig.tiny(), SchedulerConfig.diffews(),
    )
    return DiffewsPipeline(bundle)


def _episode(b, n, s, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, 255, (b, s, s, 3), np.uint8),
            rng.integers(0, 255, (b, n, s, s, 3), np.uint8),
            (rng.random((b, n, s, s)) > 0.5).astype(np.uint8))


def test_roundtrip_matches_pipeline(pipe, tmp_path):
    b, n, s = 2, 2, 32
    q, sup, msk = _episode(b, n, s)
    sm = np.ones((b, n), bool)
    sm[1, 1] = False

    out_dir = serving.save_serving_artifact(
        pipe, str(tmp_path / "art"), bsz=b, nshot=n, img_size=s)
    mod = serving.load(out_dir)
    got = mod(q, sup, msk, sm)

    want = pipe._predict_jit(
        pipe.unet_params, pipe.vae_params,
        jnp.asarray(q), jnp.asarray(sup), jnp.asarray(msk),
        pipe.empty_text_embed, jnp.asarray(sm), 1)
    assert got.dtype == jnp.uint8 and got.shape == (b, s, s, 3)
    # the deserialized program is compiled separately from the live
    # pipeline's, so XLA's fusion choices — and hence f32 reduction
    # order — can differ: allow the odd +-1 at a uint8 rounding
    # boundary, but essentially everything must be bit-equal.
    g, w = np.asarray(got, np.int16), np.asarray(want, np.int16)
    np.testing.assert_allclose(g, w, atol=1)
    assert (g == w).mean() > 0.999


def test_manifest_describes_the_contract(pipe, tmp_path):
    out_dir = serving.save_serving_artifact(
        pipe, str(tmp_path / "art"), bsz=1, nshot=1, img_size=32)
    mod = serving.load(out_dir)
    m = mod.manifest
    assert m["bsz"] == 1 and m["nshot"] == 1 and m["img_size"] == 32
    assert m["denoising_steps"] == 1 and m["platforms"]
    # default all-valid shot mask path
    q, sup, msk = _episode(1, 1, 32, seed=3)
    assert mod(q, sup, msk).shape == (1, 32, 32, 3)


def test_artifact_shape_mismatch_raises(pipe, tmp_path):
    out_dir = serving.save_serving_artifact(
        pipe, str(tmp_path / "art"), bsz=1, nshot=1, img_size=32)
    mod = serving.load(out_dir)
    q, sup, msk = _episode(2, 1, 32)  # wrong batch for a bsz-1 artifact
    with pytest.raises(Exception):
        mod(q, sup, msk, np.ones((2, 1), bool))

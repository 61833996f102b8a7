"""DiffewS-TPU: a TPU-native few-shot semantic segmentation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of DiffewS
("Unleashing the Potential of the Diffusion Model in Few-shot Semantic
Segmentation", NeurIPS 2024): one-step degenerate diffusion over a modified
Stable Diffusion 2.1 UNet with KV-fusion in-context conditioning, episodic
few-shot segmentation benchmarks, an IoU evaluation harness and an n-shot
in-context training loop.

Reference behavior contract: /root/reference (ga1i13o/DiffewS). Key entry
points mirrored:
  - evaluation_util/main_oss.py      -> diffews_tpu.cli.evaluate
  - train_tools/train_icl_*_v3.py    -> diffews_tpu.cli.train
  - diffews/marigold_pipeline_rgb_latent_noise.py -> diffews_tpu.pipeline

Everything on the compute path is jit-compiled XLA with Pallas kernels for the
fused KV-concat attention; parallelism is jax.sharding over a device Mesh.
"""

__version__ = "0.1.0"

from diffews_tpu import configs  # noqa: F401

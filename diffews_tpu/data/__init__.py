from diffews_tpu.data.dataset import FSSDataset  # noqa: F401

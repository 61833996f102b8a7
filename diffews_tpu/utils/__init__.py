from diffews_tpu.utils import init  # noqa: F401

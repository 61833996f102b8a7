from diffews_tpu.ops import attention, resize  # noqa: F401

from diffews_tpu.parallel import mesh  # noqa: F401

from diffews_tpu.training import ema, lr, state  # noqa: F401

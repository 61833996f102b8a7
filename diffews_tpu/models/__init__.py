from diffews_tpu.models import clip_text, layers, unet, vae  # noqa: F401

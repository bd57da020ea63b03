from neko_tpu.serving.server import NekoServer  # noqa: F401

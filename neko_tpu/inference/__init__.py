from neko_tpu.inference.generator import Generator

__all__ = ["Generator"]

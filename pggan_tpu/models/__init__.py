from pggan_tpu.models.generator import Generator
from pggan_tpu.models.discriminator import Discriminator

__all__ = ["Generator", "Discriminator"]

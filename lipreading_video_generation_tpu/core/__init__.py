from . import config, prng, checkpoint, metrics  # noqa: F401

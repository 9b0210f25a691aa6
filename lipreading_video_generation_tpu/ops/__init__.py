from . import audio, image, bbox  # noqa: F401

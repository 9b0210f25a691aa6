from . import manifest, video, datasets, loader  # noqa: F401

from . import (  # noqa: F401
    losses,
    train_vivit,
    train_gan,
    train_syncnet,
    train_diffusion,
    sample_diffusion,
    preprocess,
    offline_preprocess,
    feature_extraction,
    inference,
    sentence_eval,
    phonetics,
)

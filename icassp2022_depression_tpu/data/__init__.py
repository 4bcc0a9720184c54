from icassp2022_depression_tpu.data import augment, eatd, folds  # noqa: F401

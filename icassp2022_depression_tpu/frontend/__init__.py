from icassp2022_depression_tpu.frontend import audio, daic, text  # noqa: F401

from icassp2022_depression_tpu.eval import metrics  # noqa: F401

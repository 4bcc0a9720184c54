from icassp2022_depression_tpu.eval import checking, metrics, traditional  # noqa: F401

from icassp2022_depression_tpu.train import (  # noqa: F401
    checkpoints,
    loop,
    optim,
    trainers,
)

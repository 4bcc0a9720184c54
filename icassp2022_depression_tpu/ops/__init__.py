from icassp2022_depression_tpu.ops import (  # noqa: F401
    attention,
    initializers,
    mel,
    netvlad,
    nn,
    rnn,
    rnn_pallas,
)

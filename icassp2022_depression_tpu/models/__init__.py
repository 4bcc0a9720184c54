from icassp2022_depression_tpu.models import (  # noqa: F401
    audio_net,
    fusion,
    losses,
    text_net,
)

"""Golden-file regression tests: frontend outputs must stay bit-stable
across refactors (SURVEY.md §4's golden-file strategy).  Goldens were
generated on CPU with fixed PRNG keys (tests/golden/frontend_golden.npz);
regenerate deliberately only when a semantic change is intended."""

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from icassp2022_depression_tpu.models import elmo
from icassp2022_depression_tpu.ops import mel, netvlad

GOLDEN = np.load(Path(__file__).parent / "golden" / "frontend_golden.npz")


def test_log_mel_golden():
    got = np.asarray(mel.log_mel(jnp.asarray(GOLDEN["wav"]), sr=16000))
    np.testing.assert_allclose(got, GOLDEN["log_mel"], rtol=1e-5, atol=1e-5)


def test_netvlad_golden():
    nv = netvlad.per_utterance_params(0, 7, 80, 16, 256)
    got = np.asarray(netvlad.netvlad(nv, jnp.asarray(GOLDEN["log_mel"])))
    np.testing.assert_allclose(got, GOLDEN["netvlad"], rtol=1e-5, atol=1e-5)


def test_elmo_golden():
    cfg = elmo.ElmoConfig(vocab_size=512, embed_dim=16, hidden=16, layers=1,
                          output_dim=32)
    params = elmo.init(jax.random.PRNGKey(5), cfg)
    # token hashing is part of the golden contract
    ids = np.array([[elmo.token_id(t, 512)
                     for t in ("我", "今天", "很", "好")]], np.int32)
    np.testing.assert_array_equal(ids, GOLDEN["elmo_ids"])
    _, pooled = elmo.encode(params, jnp.asarray(ids), jnp.asarray([4]), cfg)
    np.testing.assert_allclose(np.asarray(pooled), GOLDEN["elmo_pooled"],
                               rtol=1e-5, atol=1e-5)

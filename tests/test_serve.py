"""Serving API: end-to-end raw-input prediction for every task."""

import numpy as np
import jax
import pytest

from icassp2022_depression_tpu import config as C, serve
from icassp2022_depression_tpu.models import audio_net, elmo, fusion, text_net
from icassp2022_depression_tpu.train import checkpoints


def _speaker(rng, seconds=0.3, sr=16000):
    wavs = [np.round(rng.standard_normal(int(sr * seconds)) * 2000)
            for _ in range(3)]
    texts = ["我 今天 很 好", "还 可以", "有点 累"]
    return wavs, [sr] * 3, texts


def test_audio_clf_predictor_end_to_end():
    params = audio_net.init(jax.random.PRNGKey(0), C.AUDIO_CLF.model)
    p = serve.Predictor(params, "audio_clf")
    rng = np.random.default_rng(0)
    wavs, srs, _ = _speaker(rng)
    r = p.predict_speaker(waveforms=wavs, sample_rates=srs)
    assert set(r) == {"label", "depressed", "probs"}
    assert r["label"] in (0, 1) and len(r["probs"]) == 2
    assert abs(sum(r["probs"]) - 1.0) < 1e-5


def test_fusion_predictor_batch_and_checkpoint_roundtrip(tmp_path):
    params = fusion.init(jax.random.PRNGKey(1), C.FUSE_CLF)
    path = tmp_path / "fuse_0.70_1"
    checkpoints.save(path, params)
    p = serve.Predictor.from_checkpoint(path, "fuse_clf")
    rng = np.random.default_rng(1)
    speakers = [_speaker(rng) for _ in range(3)]
    results = p.predict_batch(
        waveforms_per_speaker=[s[0] for s in speakers],
        sample_rates=[s[1] for s in speakers],
        texts_per_speaker=[s[2] for s in speakers])
    assert len(results) == 3
    for r in results:
        assert r["label"] in (0, 1)


def test_reg_predictor_scores():
    params = audio_net.init(jax.random.PRNGKey(2), C.AUDIO_REG.model)
    p = serve.Predictor(params, "audio_reg")
    rng = np.random.default_rng(2)
    wavs, srs, _ = _speaker(rng)
    r = p.predict_speaker(waveforms=wavs, sample_rates=srs)
    assert "sds_score" in r and r["sds_score"] >= 0.0


def test_text_predictor():
    params = text_net.init(jax.random.PRNGKey(3), C.TEXT_CLF.model)
    p = serve.Predictor(params, "text_clf")
    rng = np.random.default_rng(3)
    _, _, texts = _speaker(rng)
    r = p.predict_speaker(texts=texts)
    assert r["label"] in (0, 1)


def test_text_features_device_resident():
    """The predict path's text features stay DEVICE arrays from embedding
    into the model forward (cache entries included) — the text twin of
    the audio fast path — and the public ``text_features`` readback
    matches them exactly."""
    params = text_net.init(jax.random.PRNGKey(3), C.TEXT_CLF.model)
    p = serve.Predictor(params, "text_clf")
    rng = np.random.default_rng(7)
    _, _, texts = _speaker(rng)
    rows = p._text_feature_rows([texts])
    assert all(isinstance(r, jax.Array) for r in rows)
    # cache hit returns the SAME device row (no transfer)
    h0 = p.feature_cache.hits
    rows2 = p._text_feature_rows([texts])
    assert p.feature_cache.hits == h0 + 1
    assert all(isinstance(r, jax.Array) for r in rows2)
    np.testing.assert_array_equal(np.asarray(rows[0]),
                                  np.asarray(rows2[0]))
    feats = p.text_features([texts])
    assert isinstance(feats, np.ndarray) and feats.shape == (1, 3, 1024)
    np.testing.assert_array_equal(feats[0], np.asarray(rows[0]))


def test_serving_features_reproduce_training_extraction(tmp_path):
    """With the speaker's corpus ordinal base, serving features must equal
    the training-time extract_eatd features; without it they are
    batch-position independent."""
    from icassp2022_depression_tpu.data import eatd
    from icassp2022_depression_tpu.frontend import audio as afe

    eatd.make_synthetic_corpus(tmp_path, n_data=3, n_validation=0,
                               seconds=0.25, seed=0)
    train_feats, _, _, _ = afe.extract_eatd(tmp_path, C.FrontendConfig())
    params = audio_net.init(jax.random.PRNGKey(0), C.AUDIO_CLF.model)
    p = serve.Predictor(params, "audio_clf")
    sp = eatd.load_speaker(tmp_path, "Data", 2, read_text=False)
    # corpus position of Data/2 is index 1 -> ordinal base 3
    f = p.audio_features([sp.waveforms], [sp.sample_rates],
                         ordinal_bases=[3])
    np.testing.assert_allclose(f[0], train_feats[1, :, 0, :], atol=1e-5)
    # default ordinals: same speaker gets identical features at any batch
    # position
    other = eatd.load_speaker(tmp_path, "Data", 1, read_text=False)
    alone = p.audio_features([sp.waveforms], [sp.sample_rates])
    batched = p.audio_features([other.waveforms, sp.waveforms],
                               [other.sample_rates, sp.sample_rates])
    np.testing.assert_allclose(batched[1], alone[0], atol=1e-6)


def test_ported_torch_model_serves():
    import torch
    import torch.nn as tnn
    torch.manual_seed(0)

    class M(tnn.Module):
        def __init__(self):
            super().__init__()
            self.attention_layer = tnn.Sequential(tnn.Linear(256, 256),
                                                  tnn.ReLU(inplace=True))
            self.lstm_net_audio = tnn.GRU(256, 256, num_layers=2,
                                          batch_first=True)
            self.ln = tnn.LayerNorm(256)
            self.fc_audio = tnn.Sequential(
                tnn.Dropout(0.5), tnn.Linear(256, 256), tnn.ReLU(),
                tnn.Dropout(0.5), tnn.Linear(256, 2), tnn.Softmax(dim=1))

    sd = {k: v.detach().numpy() for k, v in M().state_dict().items()}
    p = serve.Predictor.from_torch_state_dict(sd, "audio_clf")
    rng = np.random.default_rng(4)
    wavs, srs, _ = _speaker(rng)
    r = p.predict_speaker(waveforms=wavs, sample_rates=srs)
    assert r["label"] in (0, 1)


def test_feature_cache_repeat_speaker():
    """Second request for the same speaker hits the cache and returns
    identical features; a different speaker misses."""
    params = audio_net.init(jax.random.PRNGKey(5), C.AUDIO_CLF.model)
    p = serve.Predictor(params, "audio_clf")
    rng = np.random.default_rng(5)
    wavs, srs, _ = _speaker(rng)
    r1 = p.predict_speaker(waveforms=wavs, sample_rates=srs)
    h0, m0 = p.feature_cache.hits, p.feature_cache.misses
    r2 = p.predict_speaker(waveforms=wavs, sample_rates=srs)
    assert p.feature_cache.hits == h0 + 1
    assert p.feature_cache.misses == m0
    np.testing.assert_allclose(r1["probs"], r2["probs"], atol=1e-6)
    wavs2, srs2, _ = _speaker(rng)
    p.predict_speaker(waveforms=wavs2, sample_rates=srs2)
    assert p.feature_cache.misses == m0 + 1
    # ordinal base participates in the key (different NetVLAD params)
    p.predict_speaker(waveforms=wavs, sample_rates=srs, ordinal_base=9)
    assert p.feature_cache.misses == m0 + 2


def test_feature_cache_eviction():
    cache = serve._FeatureCache(max_entries=2)
    for i in range(3):
        cache.put(f"k{i}", np.full(2, i, np.float32))
    assert cache.get("k0") is None          # evicted (LRU)
    assert cache.get("k2") is not None


def test_http_front_end_to_end():
    import base64
    import http.client
    import json
    import threading

    params = fusion.init(jax.random.PRNGKey(6), C.FUSE_CLF)
    p = serve.Predictor(params, "fuse_clf")
    server = serve.make_http_server(p, port=0)   # ephemeral port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.default_rng(6)
        wavs, srs, texts = _speaker(rng)
        body = json.dumps({"speakers": [{
            "texts": texts,
            "wav_b64": [base64.b64encode(
                w.astype(np.int16).tobytes()).decode() for w in wavs],
            "sr": srs,
        }]})
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/predict", body,
                     {"Content-Type": "application/json"})
        resp = json.loads(conn.getresponse().read())
        assert len(resp["results"]) == 1
        assert resp["results"][0]["label"] in (0, 1)

        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["ok"] and health["task"] == "fuse_clf"
        assert health["cache"]["misses"] >= 1

        conn.request("POST", "/predict", "{bad json",
                     {"Content-Type": "application/json"})
        err = conn.getresponse()
        assert err.status == 400 and "error" in json.loads(err.read())
    finally:
        server.shutdown()
        server.server_close()


def test_predictor_uses_pretrained_elmo_bundle(tmp_path, monkeypatch):
    """With a converted ELMo bundle present, text features come from the
    pretrained encoder (different width proves the path was taken)."""
    import json as _json

    import torch

    from icassp2022_depression_tpu.models import elmo_pretrained

    # build a tiny synthetic released dir inline (16-d proj -> 32-d output)
    root = tmp_path / "zhs.model"
    root.mkdir()
    SP = ["<pad>", "<oov>", "<bos>", "<eos>", "<bow>", "<eow>"]
    chars = {t: i for i, t in enumerate(SP + list("我今天很好还可以有点累"))}
    words = {t: i for i, t in enumerate(SP[:4] + ["我", "今天", "很", "好"])}
    for name, lex in (("char.dic", chars), ("word.dic", words)):
        (root / name).write_text(
            "".join(f"{t}\t{i}\n" for t, i in lex.items()), encoding="utf-8")
    arch = {"encoder": {"name": "elmo", "projection_dim": 16, "dim": 32,
                        "n_layers": 2, "cell_clip": 3, "proj_clip": 3},
            "token_embedder": {"name": "cnn", "activation": "relu",
                               "filters": [[1, 4], [2, 8]], "n_highway": 1,
                               "word_dim": 6, "char_dim": 8,
                               "max_characters_per_token": 6}}
    (root / "cnn.json").write_text(_json.dumps(arch))
    (root / "config.json").write_text(_json.dumps({"config_path": "cnn.json"}))
    torch.manual_seed(0)
    F = 12
    te = {"char_emb_layer.embedding.weight": torch.randn(len(chars), 8),
          "word_emb_layer.embedding.weight": torch.randn(len(words), 6),
          "projection.weight": torch.randn(16, 6 + F) * .3,
          "projection.bias": torch.randn(16) * .1,
          "convolutions.0.weight": torch.randn(4, 8, 1) * .3,
          "convolutions.0.bias": torch.randn(4) * .1,
          "convolutions.1.weight": torch.randn(8, 8, 2) * .3,
          "convolutions.1.bias": torch.randn(8) * .1,
          "highways._layers.0.weight": torch.randn(2 * F, F) * .2,
          "highways._layers.0.bias": torch.randn(2 * F) * .1}
    enc = {}
    for d in ("forward", "backward"):
        for k in range(2):
            pre = f"{d}_layer_{k}"
            enc[f"{pre}.input_linearity.weight"] = torch.randn(128, 16) * .2
            enc[f"{pre}.state_linearity.weight"] = torch.randn(128, 16) * .2
            enc[f"{pre}.state_linearity.bias"] = torch.randn(128) * .1
            enc[f"{pre}.state_projection.weight"] = torch.randn(16, 32) * .2
    torch.save(te, root / "token_embedder.pkl")
    torch.save(enc, root / "encoder.pkl")

    bundle = tmp_path / "elmo.npz"
    elmo_pretrained.save_npz(bundle, elmo_pretrained.convert_model_dir(root))
    monkeypatch.setenv("ICASSP_ELMO_WEIGHTS", str(bundle))

    params = text_net.init(jax.random.PRNGKey(7),
                           C.replace(C.TEXT_CLF.model, embedding_size=32))
    p = serve.Predictor(params, "text_clf")
    assert p.embedder_id.startswith("elmo_bundle")   # bundle resolved
    assert p._text_dim == 32
    feats = p.text_features([["我 今天 很 好", "还 可以", "有点 累"]])
    assert feats.shape == (1, 3, 32)


def test_micro_batching_http_front():
    """Concurrent requests coalesce into fewer device batches; every
    client gets its own correct slice."""
    import base64
    import http.client
    import json
    import threading

    params = audio_net.init(jax.random.PRNGKey(8), C.AUDIO_CLF.model)
    p = serve.Predictor(params, "audio_clf")
    server = serve.make_http_server(p, port=0, batch_window_ms=500,
                                    max_batch=16)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    rng = np.random.default_rng(8)

    def one_request(out, i):
        wavs, srs, _ = _speaker(rng if i == 0 else np.random.default_rng(i))
        body = json.dumps({"speakers": [{
            "wav_b64": [base64.b64encode(
                np.asarray(w, np.int16).tobytes()).decode() for w in wavs],
            "sr": srs}]})
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/predict", body,
                     {"Content-Type": "application/json"})
        out[i] = json.loads(conn.getresponse().read())
        conn.close()

    try:
        one_request({}, 99)  # warm compiles outside the concurrent burst
        out: dict = {}
        threads = [threading.Thread(target=one_request, args=(out, i))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(len(out[i]["results"]) == 1 for i in range(4))
        assert all(out[i]["results"][0]["label"] in (0, 1) for i in range(4))

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        b = health["batcher"]
        assert b["requests_served"] >= 5
        # the 4-request burst must have coalesced
        assert b["batches_run"] < b["requests_served"]
    finally:
        server.shutdown()
        server.server_close()


def test_predictor_warmup_compiles_shapes():
    params = audio_net.init(jax.random.PRNGKey(9), C.AUDIO_CLF.model)
    p = serve.Predictor(params, "audio_clf")
    p.warmup(batch_sizes=(1,), utt_seconds=0.3)
    assert p.feature_cache.misses >= 1


def test_from_checkpoint_warns_on_embedder_mismatch(tmp_path, capsys):
    params = text_net.init(jax.random.PRNGKey(10), C.TEXT_CLF.model)
    path = tmp_path / "BiLSTM_128_0.70_1"
    checkpoints.save(path, params, {"text_embedder": "prng:seed=99"})
    p = serve.Predictor.from_checkpoint(path, "text_clf",
                                        elmo_weights=None, seed=0)
    assert p.embedder_id == "prng:seed=0"
    assert "trained on features from embedder" in capsys.readouterr().err
    # matching id: no warning
    checkpoints.save(path, params, {"text_embedder": "prng:seed=0"})
    serve.Predictor.from_checkpoint(path, "text_clf", elmo_weights=None,
                                    seed=0)
    assert "trained on features" not in capsys.readouterr().err


def test_from_checkpoint_adopts_training_segmenter(tmp_path, capsys):
    """Train/serve tokenisation must not skew: from_checkpoint adopts the
    segmenter recorded in the checkpoint's text_segmenter sidecar field
    (written from the extraction sidecar), and an explicit override that
    mismatches warns loudly."""
    from icassp2022_depression_tpu.frontend import text as text_fe

    params = text_net.init(jax.random.PRNGKey(11), C.TEXT_CLF.model)
    path = tmp_path / "BiLSTM_128_0.71_1"
    checkpoints.save(path, params, {"text_embedder": "prng:seed=0",
                                    "text_segmenter": "fallback"})
    p = serve.Predictor.from_checkpoint(path, "text_clf",
                                        elmo_weights=None, seed=0)
    assert p.segmenter == "fallback"
    err = capsys.readouterr().err
    assert "adopting segmenter 'fallback'" in err
    # the adopted segmenter actually drives serve-time tokenisation
    sr = 16000
    waves = [np.zeros(sr // 4, np.int16)] * 3
    calls = []

    def spy(text):
        calls.append(text)
        return text_fe.fallback_segment(text)

    real = text_fe.SEGMENTERS["fallback"]
    text_fe.SEGMENTERS["fallback"] = spy
    try:
        p.predict_speaker(waveforms=waves, sample_rates=[sr] * 3,
                          texts=["我 今天", "还 好", "再见"])
    finally:
        text_fe.SEGMENTERS["fallback"] = real
    assert len(calls) == 3
    # explicit mismatching override: loud warning
    serve.Predictor.from_checkpoint(path, "text_clf", elmo_weights=None,
                                    seed=0, segmenter="auto")
    assert "segmented by 'fallback'" in capsys.readouterr().err
    # unknown segmenter names fail at construction
    with pytest.raises(ValueError, match="unknown segmenter"):
        serve.Predictor(params, "text_clf", elmo_weights=None,
                        segmenter="nope")


def test_micro_batcher_sustained_overload_sheds_and_drains():
    """Requests arriving faster than max_batch per window: admission is
    bounded (excess sheds with ServerOverloaded), every ADMITTED request
    completes (no starvation), and the queue drains back to empty."""
    import threading
    import time

    params = audio_net.init(jax.random.PRNGKey(12), C.AUDIO_CLF.model)
    p = serve.Predictor(params, "audio_clf")
    b = serve._MicroBatcher(p, window_s=0.05, max_batch=2, max_queue=4)
    wavs, srs, _ = _speaker(np.random.default_rng(12))
    b.submit({"waves": [wavs], "srs": [srs], "texts": None, "bases": None,
              "n": 1})   # warm compiles before the burst
    out: dict = {}

    def client(i):
        try:
            out[i] = b.submit({"waves": [wavs], "srs": [srs], "texts": None,
                               "bases": None, "n": 1})
        except serve.ServerOverloaded as exc:
            out[i] = exc

    threads = []
    for wave in range(4):           # 4 waves x 6 clients, faster than drain
        for j in range(6):
            t = threading.Thread(target=client, args=(wave * 6 + j,))
            t.start()
            threads.append(t)
        time.sleep(0.02)
    for t in threads:
        t.join()
    served = [i for i, r in out.items() if isinstance(r, list)]
    shed = [i for i, r in out.items() if isinstance(r, serve.ServerOverloaded)]
    assert len(served) + len(shed) == 24
    assert len(shed) >= 1                    # overload actually shed
    assert len(served) >= 4                  # admitted work was served
    assert all(out[i][0]["label"] in (0, 1) for i in served)
    assert b.requests_shed == len(shed)
    assert b._pending == 0                   # drained: no stuck admissions
    # post-overload requests are served normally (no wedged state)
    r = b.submit({"waves": [wavs], "srs": [srs], "texts": None,
                  "bases": None, "n": 1})
    assert r[0]["label"] in (0, 1)


def test_micro_batcher_held_overflow_completes():
    """A request that would overflow the forming batch is held for the
    NEXT round (FIFO) and completes — the held path drains under back-to-
    back multi-speaker requests."""
    import threading

    params = audio_net.init(jax.random.PRNGKey(13), C.AUDIO_CLF.model)
    p = serve.Predictor(params, "audio_clf")
    b = serve._MicroBatcher(p, window_s=0.25, max_batch=3, max_queue=16)
    rng = np.random.default_rng(13)

    def spk():
        w, s, _ = _speaker(rng)
        return w, s

    reqs = []
    for n in (2, 2, 1):   # round 1: [2] (next 2 would overflow -> held);
        waves, srs = [], []   # round 2: [held 2, 1]
        for _ in range(n):
            w, s = spk()
            waves.append(w)
            srs.append(s)
        reqs.append({"waves": waves, "srs": srs, "texts": None,
                     "bases": None, "n": n})
    out: dict = {}

    def run(i):
        out[i] = b.submit(reqs[i])

    threads = [threading.Thread(target=run, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert [len(out[i]) for i in range(3)] == [2, 2, 1]
    assert all(r["label"] in (0, 1) for i in range(3) for r in out[i])
    assert b._pending == 0


def test_http_overload_returns_503():
    """Overload at the HTTP layer: 503 + Retry-After (shed), while at
    least one concurrent request succeeds; healthz reports the sheds."""
    import base64
    import http.client
    import json
    import threading

    params = audio_net.init(jax.random.PRNGKey(14), C.AUDIO_CLF.model)
    p = serve.Predictor(params, "audio_clf")
    server = serve.make_http_server(p, port=0, batch_window_ms=300,
                                    max_batch=1, max_queue=1)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    rng = np.random.default_rng(14)
    wavs, srs, _ = _speaker(rng)
    body = json.dumps({"speakers": [{
        "wav_b64": [base64.b64encode(
            np.asarray(w, np.int16).tobytes()).decode() for w in wavs],
        "sr": srs}]})

    def one(out, i):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/predict", body,
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        out[i] = (resp.status, json.loads(resp.read()),
                  resp.getheader("Retry-After"))
        conn.close()

    try:
        one({}, 99)  # warm compiles
        out: dict = {}
        threads = [threading.Thread(target=one, args=(out, i))
                   for i in range(5)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        statuses = [out[i][0] for i in range(5)]
        assert 200 in statuses
        assert 503 in statuses
        shed = next(i for i in range(5) if out[i][0] == 503)
        assert "overloaded" in out[shed][1]["error"]
        assert out[shed][2] == "1"           # Retry-After header
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["batcher"]["requests_shed"] >= 1
        assert health["batcher"]["max_queue"] == 1
        conn.close()
    finally:
        server.shutdown()
        server.server_close()


def test_http_streaming_endpoint():
    """POST /predict_stream answers chunked NDJSON, one line per speaker,
    through the micro-batcher."""
    import base64
    import http.client
    import json
    import threading

    params = audio_net.init(jax.random.PRNGKey(15), C.AUDIO_CLF.model)
    p = serve.Predictor(params, "audio_clf")
    server = serve.make_http_server(p, port=0, batch_window_ms=50,
                                    max_batch=8)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    rng = np.random.default_rng(15)
    speakers = []
    for _ in range(3):
        wavs, srs, _ = _speaker(rng)
        speakers.append({"wav_b64": [base64.b64encode(
            np.asarray(w, np.int16).tobytes()).decode() for w in wavs],
            "sr": srs})
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/predict_stream",
                     json.dumps({"speakers": speakers}),
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.getheader("Content-Type") == "application/x-ndjson"
        lines = [json.loads(ln) for ln in resp.read().splitlines() if ln]
        conn.close()
        assert [ln["index"] for ln in lines] == [0, 1, 2]
        assert all(ln["result"]["label"] in (0, 1) for ln in lines)
    finally:
        server.shutdown()
        server.server_close()


def test_oversized_request_admitted_when_idle():
    """A request with more speakers than max_queue must still be served
    when the queue is idle — a 503 whose retry can never succeed would be
    a permanent rejection of large batches."""
    params = audio_net.init(jax.random.PRNGKey(16), C.AUDIO_CLF.model)
    p = serve.Predictor(params, "audio_clf")
    b = serve._MicroBatcher(p, window_s=0.05, max_batch=4, max_queue=2)
    rng = np.random.default_rng(16)
    waves, srs = [], []
    for _ in range(3):   # n=3 > max_queue=2
        w, s, _ = _speaker(rng)
        waves.append(w)
        srs.append(s)
    out = b.submit({"waves": waves, "srs": srs, "texts": None,
                    "bases": None, "n": 3})
    assert len(out) == 3 and all(r["label"] in (0, 1) for r in out)
    assert b.requests_shed == 0 and b._pending == 0


def test_stream_larger_than_queue_completes():
    """/predict_stream with more speakers than max_queue drains its own
    in-flight speakers to free capacity instead of shedding them: every
    speaker gets a result line."""
    import base64
    import http.client
    import json
    import threading

    params = audio_net.init(jax.random.PRNGKey(17), C.AUDIO_CLF.model)
    p = serve.Predictor(params, "audio_clf")
    server = serve.make_http_server(p, port=0, batch_window_ms=30,
                                    max_batch=2, max_queue=2)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    rng = np.random.default_rng(17)
    speakers = []
    for _ in range(5):   # 5 > max_queue=2
        wavs, srs, _ = _speaker(rng)
        speakers.append({"wav_b64": [base64.b64encode(
            np.asarray(w, np.int16).tobytes()).decode() for w in wavs],
            "sr": srs})
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("POST", "/predict_stream",
                     json.dumps({"speakers": speakers}),
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        lines = [json.loads(ln) for ln in resp.read().splitlines() if ln]
        conn.close()
        assert [ln["index"] for ln in lines] == list(range(5))
        assert all("result" in ln for ln in lines), lines
    finally:
        server.shutdown()
        server.server_close()


def test_micro_batcher_isolates_bad_request():
    """A malformed request in a coalesced batch must not fail the valid
    co-batched one."""
    import threading

    params = audio_net.init(jax.random.PRNGKey(11), C.AUDIO_CLF.model)
    p = serve.Predictor(params, "audio_clf")
    b = serve._MicroBatcher(p, window_s=0.3, max_batch=8)
    rng = np.random.default_rng(11)
    wavs, srs, _ = _speaker(rng)
    good = {"waves": [wavs], "srs": [srs], "texts": None, "bases": None,
            "n": 1}
    bad = {"waves": [wavs[:2]], "srs": [srs[:2]], "texts": None,
           "bases": None, "n": 1}   # 2 answers instead of 3
    out = {}

    def run(name, req):
        try:
            out[name] = b.submit(req)
        except Exception as exc:
            out[name] = exc

    ts = [threading.Thread(target=run, args=(n_, r))
          for n_, r in (("good", good), ("bad", bad))]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert isinstance(out["bad"], Exception)
    assert isinstance(out["good"], list) and out["good"][0]["label"] in (0, 1)


def test_latency_histogram_quantiles():
    """Bucketed quantile interpolation and the observability snapshot."""
    h = serve.LatencyHistogram()
    assert h.snapshot() == {"count": 0}
    for ms in (0.5, 1.5, 3.0, 8.0, 20.0, 40.0, 80.0, 200.0, 12000.0):
        h.observe(ms / 1000.0)
    s = h.snapshot()
    assert s["count"] == 9
    assert s["max_ms"] == pytest.approx(12000.0, rel=1e-6)
    assert s["mean_ms"] == pytest.approx(sum(
        (0.5, 1.5, 3.0, 8.0, 20.0, 40.0, 80.0, 200.0, 12000.0)) / 9,
        rel=1e-3)
    # p50 of 9 obs -> 4.5th falls in the (10, 25] bucket (5th observation)
    assert 10.0 < s["p50_ms"] <= 25.0
    assert s["p99_ms"] >= 10000.0            # overflow bucket lower edge
    assert s["buckets"]["inf"] == 1
    assert sum(s["buckets"].values()) == 9


def test_healthz_latency_and_auth_and_binary():
    """The three serving extras together: bearer auth (401 without the
    token, healthz open), zero-copy /predict_bin matching /predict
    bit-for-bit, and /healthz latency histograms populated."""
    import base64
    import http.client
    import json
    import threading

    params = audio_net.init(jax.random.PRNGKey(18), C.AUDIO_CLF.model)
    p = serve.Predictor(params, "audio_clf")
    server = serve.make_http_server(p, port=0, batch_window_ms=20,
                                    max_batch=8, auth_token="s3cret")
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    rng = np.random.default_rng(18)
    wavs, srs, _ = _speaker(rng)
    wavs = [np.asarray(w, np.int16) for w in wavs]
    body_b64 = json.dumps({"speakers": [{
        "wav_b64": [base64.b64encode(w.tobytes()).decode() for w in wavs],
        "sr": srs}]})
    header = json.dumps({"speakers": [{
        "n_samples": [len(w) for w in wavs], "sr": srs}]}).encode()
    body_bin = (len(header).to_bytes(4, "little") + header
                + b"".join(w.tobytes() for w in wavs))
    auth = {"Authorization": "Bearer s3cret"}
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        # no token -> 401 + WWW-Authenticate; wrong token -> 401
        conn.request("POST", "/predict", body_b64)
        r = conn.getresponse()
        assert r.status == 401
        assert r.getheader("WWW-Authenticate") == "Bearer"
        r.read()
        conn.request("POST", "/predict", body_b64,
                     {"Authorization": "Bearer wrong"})
        r = conn.getresponse()
        assert r.status == 401
        r.read()
        # healthz stays open for probes
        conn.request("GET", "/healthz")
        r = conn.getresponse()
        assert r.status == 200
        assert json.loads(r.read())["ok"]
        # authorized base64 and binary requests agree exactly
        conn.request("POST", "/predict", body_b64, auth)
        r = conn.getresponse()
        assert r.status == 200
        via_b64 = json.loads(r.read())["results"]
        conn.request("POST", "/predict_bin", body_bin, auth)
        r = conn.getresponse()
        assert r.status == 200
        via_bin = json.loads(r.read())["results"]
        assert via_bin == via_b64
        # truncated binary payload -> 400, not a crash
        conn.request("POST", "/predict_bin", body_bin[:-100], auth)
        r = conn.getresponse()
        assert r.status == 400
        r.read()
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        lat = health["latency"]
        assert lat["request"]["count"] >= 2
        assert lat["device_batch"]["count"] >= 2
        assert lat["request"]["p50_ms"] > 0
        assert set(lat["request"]) >= {"count", "mean_ms", "p50_ms",
                                       "p90_ms", "p99_ms", "buckets"}
        conn.close()
    finally:
        server.shutdown()
        server.server_close()


def test_tls_serving(tmp_path):
    """--tls-cert/--tls-key serve HTTPS (self-signed cert, stdlib ssl)."""
    import http.client
    import json
    import ssl
    import subprocess
    import threading

    cert, key = tmp_path / "crt.pem", tmp_path / "key.pem"
    gen = subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", str(key), "-out", str(cert), "-days", "1",
         "-subj", "/CN=127.0.0.1"], capture_output=True)
    if gen.returncode != 0:
        pytest.skip("openssl unavailable to mint a test certificate")
    params = audio_net.init(jax.random.PRNGKey(19), C.AUDIO_CLF.model)
    p = serve.Predictor(params, "audio_clf")
    server = serve.make_http_server(p, port=0, tls_cert=str(cert),
                                    tls_key=str(key))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    ctx = ssl.create_default_context(cafile=str(cert))
    ctx.check_hostname = False
    try:
        conn = http.client.HTTPSConnection("127.0.0.1", port, timeout=60,
                                           context=ctx)
        conn.request("GET", "/healthz")
        r = conn.getresponse()
        assert r.status == 200 and json.loads(r.read())["ok"]
        conn.close()
    finally:
        server.shutdown()
        server.server_close()


def test_auth_hardening_eof_and_non_ascii():
    """Auth-failure paths must not wedge the server: a client that
    advertises a large Content-Length then disconnects (EOF mid-drain),
    and a non-ASCII Authorization header (latin-1 decoded by
    http.server), both leave the server serving."""
    import http.client
    import json
    import socket
    import threading

    params = audio_net.init(jax.random.PRNGKey(20), C.AUDIO_CLF.model)
    p = serve.Predictor(params, "audio_clf")
    server = serve.make_http_server(p, port=0, batch_window_ms=20,
                                    auth_token="tok")
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        # half-open client: headers promise 1 MB, then the socket closes
        s = socket.create_connection(("127.0.0.1", port), timeout=30)
        s.sendall(b"POST /predict HTTP/1.1\r\nHost: x\r\n"
                  b"Content-Length: 1000000\r\n\r\npartial")
        s.shutdown(socket.SHUT_WR)
        s.settimeout(30)
        assert b"401" in s.recv(1024)     # responded, did not spin
        s.close()
        # non-ASCII bearer token -> clean 401, not a TypeError crash
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/healthz")   # server still alive
        r = conn.getresponse()
        assert r.status == 200
        r.read()
        conn.request("POST", "/predict", "{}",
                     {"Authorization": "Bearer café"})
        r = conn.getresponse()
        assert r.status == 401
        r.read()
        conn.close()
    finally:
        server.shutdown()
        server.server_close()


def test_predict_bin_rejects_negative_n_samples():
    """A negative n_samples must 400 (it would otherwise alias
    already-consumed body bytes via frombuffer's count=-1 semantics)."""
    import http.client
    import json
    import threading

    params = audio_net.init(jax.random.PRNGKey(21), C.AUDIO_CLF.model)
    p = serve.Predictor(params, "audio_clf")
    server = serve.make_http_server(p, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    header = json.dumps({"speakers": [{
        "n_samples": [-1, 100, 100], "sr": [16000] * 3}]}).encode()
    body = (len(header).to_bytes(4, "little") + header + b"\x00" * 600)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("POST", "/predict_bin", body)
        r = conn.getresponse()
        assert r.status == 400
        assert "negative n_samples" in json.loads(r.read())["error"]
        conn.close()
    finally:
        server.shutdown()
        server.server_close()


def test_vggish_trained_model_serves(tmp_path):
    """A model trained on extract-audio --embedder vggish features is
    servable: Predictor(audio_embedder='vggish', model_cfg=<128-d>)
    reproduces the training-time features and round-trips through
    from_checkpoint."""
    from icassp2022_depression_tpu.data import eatd
    from icassp2022_depression_tpu.frontend import audio as afe

    # utterances must exceed one 0.96 s VGGish example or every feature
    # is a zero vector and the parity assertions are vacuous
    eatd.make_synthetic_corpus(tmp_path, n_data=2, n_validation=0,
                               seconds=1.3, seed=9)
    feats, _, _, _ = afe.extract_eatd_vggish(tmp_path, seed=0)
    assert np.abs(feats).sum() > 0

    mcfg = C.replace(C.AUDIO_CLF.model, embedding_size=128)
    params = audio_net.init(jax.random.PRNGKey(22), mcfg)
    path = tmp_path / "gru_vggish_0.70_1"
    checkpoints.save(path, params)
    p = serve.Predictor.from_checkpoint(path, "audio_clf",
                                        audio_embedder="vggish",
                                        model_cfg=mcfg)
    sp = eatd.load_speaker(tmp_path, "Data", 1, read_text=False)
    got = p.audio_features([sp.waveforms], [sp.sample_rates])
    np.testing.assert_allclose(got[0], feats[0, :, 0, :], atol=2e-5)
    r = p.predict_speaker(waveforms=sp.waveforms,
                          sample_rates=sp.sample_rates)
    assert r["label"] in (0, 1)
    # repeat hits the cache, and the cached entry is isolated from
    # caller-side mutation of the returned array
    h0 = p.feature_cache.hits
    got[0][:] = -1.0
    again = p.audio_features([sp.waveforms], [sp.sample_rates])
    assert p.feature_cache.hits == h0 + 1
    np.testing.assert_allclose(again[0], feats[0, :, 0, :], atol=2e-5)

    # PCA-postprocessed extraction serves identically when the SAME
    # postprocessor is passed (and differs when it is not)
    from icassp2022_depression_tpu.models import vggish as vg
    post = vg.Postprocessor.random(jax.random.PRNGKey(3))
    feats_pca, _, _, _ = afe.extract_eatd_vggish(tmp_path, seed=0,
                                                 postprocessor=post)
    p_pca = serve.Predictor(params, "audio_clf", audio_embedder="vggish",
                            model_cfg=mcfg, vggish_postprocessor=post)
    got_pca = p_pca.audio_features([sp.waveforms], [sp.sample_rates])
    np.testing.assert_allclose(got_pca[0], feats_pca[0, :, 0, :],
                               atol=2e-5)
    assert not np.allclose(got_pca[0], feats[0, :, 0, :])


def test_empty_speaker_batch_is_valid():
    """Zero speakers is a valid request answered with zero results (the
    device-resident fast path must not crash on jnp.stack([]))."""
    params = audio_net.init(jax.random.PRNGKey(23), C.AUDIO_CLF.model)
    p = serve.Predictor(params, "audio_clf")
    assert p.predict_batch([], []) == []
    assert p.audio_features([], []).shape == (0, 3, 256)


def test_serve_facade_reexports_full_surface():
    """serve.py is a thin re-export over serving/{predictors,transport} —
    every public (and test-used private) name must resolve to the split
    modules so the facade cannot silently drift from the implementation."""
    from icassp2022_depression_tpu.serving import predictors, transport

    for name in ("TASKS", "Predictor", "DaicPredictor", "_FeatureCache",
                 "_format_outputs", "_model_for", "_pow2"):
        assert getattr(serve, name) is getattr(predictors, name)
    for name in ("ServerOverloaded", "LatencyHistogram", "_MicroBatcher",
                 "_DaicMicroBatcher", "make_http_server", "serve_http"):
        assert getattr(serve, name) is getattr(transport, name)

"""DAIC downstream training over ragged responses (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from icassp2022_depression_tpu import config as C
from icassp2022_depression_tpu.models import audio_net
from icassp2022_depression_tpu.train import daic


def _ragged(n, rng, dep_frac=0.4, d=16):
    feats, labels = [], []
    for _ in range(n):
        dep = rng.random() < dep_frac
        r = int(rng.integers(2, 7))
        base = 0.8 if dep else -0.8
        feats.append((base + rng.standard_normal((r, 1, d))).astype(np.float32))
        labels.append(int(dep))
    return feats, labels


def test_daic_clf_trains_on_ragged():
    rng = np.random.default_rng(0)
    tr_f, tr_y = _ragged(24, rng)
    te_f, te_y = _ragged(10, rng)
    tcfg = C.replace(
        daic.DAIC_CLF,
        model=C.replace(daic.DAIC_CLF.model, embedding_size=16,
                        hidden_dims=16),
        optimizer=C.replace(daic.DAIC_CLF.optimizer, learning_rate=3e-2),
        epochs=31, batch_size=8)
    result = daic.train_daic(tr_f, tr_y, te_f, te_y, tcfg, seed=0)
    assert result["logs"]["f1"].shape == (30,)
    assert result["best"]["f1"] > 0.5  # separable synthetic data


def test_daic_text_modality_and_multimodal():
    """Response transcripts -> embeddings -> concat with audio features ->
    the masked-pooling trainer runs on the joint representation."""
    from icassp2022_depression_tpu.frontend import daic as daic_fe
    from icassp2022_depression_tpu.models import elmo

    transcript = [
        {"start_time": 0.0, "stop_time": 0.5, "speaker": "Ellie",
         "value": "how are you"},
        {"start_time": 0.6, "stop_time": 1.0, "speaker": "Participant",
         "value": "fine thanks"},
        {"start_time": 1.1, "stop_time": 1.4, "speaker": "Participant",
         "value": "really"},
        {"start_time": 2.0, "stop_time": 2.5, "speaker": "Ellie",
         "value": "how did you sleep"},
        {"start_time": 2.6, "stop_time": 3.0, "speaker": "Participant",
         "value": "scrubbed_entry"},
        {"start_time": 3.1, "stop_time": 3.5, "speaker": "Participant",
         "value": "not great"},
        {"start_time": 4.0, "stop_time": 4.2, "speaker": "Ellie",
         "value": "i think i have asked everything for now"},
    ]
    wave = np.arange(16000 * 5, dtype=np.float64)
    signals, texts = daic_fe.segment_responses(
        transcript, wave, 16000, ["how are you", "how did you sleep"],
        with_text=True)
    assert texts == ["fine thanks really", "not great"]
    assert len(signals) == 2

    # multimodal concat feeds the trainer
    rng = np.random.default_rng(1)
    audio = [rng.standard_normal((2, 1, 8)).astype(np.float32)]
    cfg = elmo.ElmoConfig(vocab_size=64, embed_dim=8, hidden=4, layers=1,
                          output_dim=8)
    params = elmo.init(jax.random.PRNGKey(0), cfg)
    from icassp2022_depression_tpu.frontend import text as text_fe
    text = [text_fe.embed_sentences(params,
                                    [text_fe.tokenize(t) for t in texts],
                                    cfg)]
    mm = daic.concat_multimodal(audio, text)
    assert mm[0].shape == (2, 1, 16)


def test_masked_pooling_ignores_padding():
    cfg = C.replace(daic.DAIC_CLF.model, embedding_size=8, hidden_dims=8)
    params = audio_net.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    x_short = rng.standard_normal((1, 3, 8)).astype(np.float32)
    x_padded = np.concatenate(
        [x_short, 99.0 * np.ones((1, 4, 8), np.float32)], axis=1)
    mask = np.array([[1, 1, 1, 0, 0, 0, 0]], np.float32)
    a = audio_net.apply(params, cfg, jnp.asarray(x_short))
    b = audio_net.apply(params, cfg, jnp.asarray(x_padded),
                        time_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def _make_daic_corpus(tmp_path, pids=(300, 301)):
    from icassp2022_depression_tpu.data import eatd

    rng = np.random.default_rng(0)
    sr = 16000
    for pid in pids:
        d = tmp_path / f"{pid}_P"
        d.mkdir(parents=True)
        eatd.write_wav(d / f"{pid}_AUDIO.wav",
                       rng.standard_normal(sr * 6) * 3000, sr)
        rows = [
            "start_time\tstop_time\tspeaker\tvalue",
            "0.0\t0.5\tEllie\thow are you doing today",
            "0.6\t1.4\tParticipant\tpretty good",
            "2.0\t2.5\tEllie\twhat are you like when you don't sleep well",
            "2.6\t4.0\tParticipant\tnot great honestly",
            "4.2\t4.5\tEllie\ti think i have asked everything i need to",
        ]
        (d / f"{pid}_TRANSCRIPT.csv").write_text("\n".join(rows) + "\n")
    queries = tmp_path / "queries.txt"
    queries.write_text("how are you doing today\n"
                       "what are you like when you don't sleep well\n")
    train_csv = tmp_path / "train_split.csv"
    train_csv.write_text("Participant_ID,PHQ8_Binary,PHQ8_Score\n"
                         f"{pids[0]},1,15\n")
    test_csv = tmp_path / "test_split.csv"
    test_csv.write_text("Participant_ID,PHQ8_Binary,PHQ8_Score\n"
                        f"{pids[1]},0,3\n")
    return queries, train_csv, test_csv


def test_extract_split_multimodal_roundtrip_and_train(tmp_path):
    """extract-daic --multimodal layout -> loader -> concat -> trainer:
    the full DAIC cross-corpus multimodal path end-to-end."""
    from icassp2022_depression_tpu import config as C
    from icassp2022_depression_tpu.frontend import daic as daic_fe
    from icassp2022_depression_tpu.models import elmo

    queries, train_csv, test_csv = _make_daic_corpus(tmp_path)
    ecfg = elmo.ElmoConfig(vocab_size=64, embed_dim=8, hidden=4, layers=1,
                           output_dim=8)
    feats = tmp_path / "Features"
    for name, csv_path in (("train", train_csv), ("test", test_csv)):
        a, t, cl, rl = daic_fe.extract_split_multimodal(
            tmp_path, csv_path, queries, elmo_cfg=ecfg, elmo_weights=None,
            out_prefix=feats, split_name=name)
        assert a[0].shape == (2, 1, 256) and t[0].shape == (2, 8)

    xa_tr, xt_tr, y_tr = daic_fe.load_features(feats, "train", "clf", True)
    xa_te, xt_te, y_te = daic_fe.load_features(feats, "test", "clf", True)
    np.testing.assert_array_equal(y_tr, [1])
    np.testing.assert_array_equal(y_te, [0])
    x_tr = daic.concat_multimodal(xa_tr, xt_tr)
    x_te = daic.concat_multimodal(xa_te, xt_te)
    assert x_tr[0].shape == (2, 1, 264)

    tcfg = C.replace(
        daic.DAIC_CLF, epochs=3, batch_size=2,
        model=C.replace(daic.DAIC_CLF.model, embedding_size=264,
                        hidden_dims=16))
    result = daic.train_daic(x_tr, y_tr, x_te, y_te, tcfg,
                             out_dir=tmp_path / "Model")
    assert np.isfinite(result["logs"]["loss"]).all()

    # audio-only loader path unchanged
    xa, y = daic_fe.load_features(feats, "train", "reg")
    assert xa[0].shape == (2, 1, 256) and y[0] == 15.0


def test_daic_cli_flags_parse():
    from icassp2022_depression_tpu import cli

    p = cli.build_parser()
    a = p.parse_args(["extract-daic", "--daic-dir", "/d", "--split-csv",
                      "/s.csv", "--queries", "/q.txt", "--out", "/o",
                      "--multimodal"])
    assert a.multimodal
    a = p.parse_args(["train-daic", "--track", "clf", "--features", "/f",
                      "--multimodal", "--eval-split", "dev"])
    assert a.multimodal and a.eval_split == "dev"


def test_daic_predictor_end_to_end(tmp_path):
    """DaicPredictor: checkpoint round-trip, raw-session prediction via
    the bundled segmentation, and feature parity with training-time
    extraction (start_ordinal)."""
    import jax

    from icassp2022_depression_tpu import config as C, serve
    from icassp2022_depression_tpu.frontend import daic as daic_fe
    from icassp2022_depression_tpu.models import audio_net
    from icassp2022_depression_tpu.train import checkpoints

    queries, train_csv, test_csv = _make_daic_corpus(tmp_path)
    params = audio_net.init(jax.random.PRNGKey(0), daic.DAIC_CLF.model)
    ckpt = tmp_path / "daic_clf_0.80"
    checkpoints.save(ckpt, params)
    p = serve.DaicPredictor.from_checkpoint(ckpt, "daic_clf")

    r = p.predict_participant(tmp_path, 300, queries_path=queries)
    assert set(r) == {"label", "depressed", "probs"}
    assert r["label"] in (0, 1) and len(r["probs"]) == 2

    # serving features reproduce training-time extraction when the
    # participant's cumulative start ordinal is passed
    feats = daic_fe.extract_participant(tmp_path, 300,
                                        daic_fe.load_queries(queries),
                                        start_ordinal=7)
    transcript = daic_fe.read_transcript(
        tmp_path / "300_P" / "300_TRANSCRIPT.csv")
    wave, sr = daic_fe.read_wav(tmp_path / "300_P" / "300_AUDIO.wav")
    signals = daic_fe.segment_responses(transcript, wave, sr,
                                        daic_fe.load_queries(queries))
    got = p.response_features([signals], [sr], start_ordinals=[7])
    np.testing.assert_allclose(got[0], feats, atol=1e-5)

    # regression task + ragged multi-participant batch
    preg = serve.DaicPredictor(
        audio_net.init(jax.random.PRNGKey(1), daic.DAIC_REG.model),
        "daic_reg")
    out = preg.predict_signals([signals, signals[:1]], [sr, sr])
    assert len(out) == 2 and all("phq8_score" in r for r in out)
    assert out[0]["phq8_score"] >= 0.0

    # the device-resident signals path == the host features path
    via_features = preg.predict_features(
        preg.response_features([signals, signals[:1]], [sr, sr]))
    for a, b in zip(out, via_features):
        np.testing.assert_allclose(a["phq8_score"], b["phq8_score"],
                                   atol=1e-5)

    # zero participants is a valid request (CLAUDE.md invariant)
    assert preg.predict_signals([], []) == []

    # repeat participants hit the per-response feature LRU entirely
    # (keys are 0-based per participant, so batch position is irrelevant)
    h0 = preg.feature_cache.hits
    again = preg.predict_signals([signals[:1], signals], [sr, sr])
    assert preg.feature_cache.hits >= h0 + len(signals) + 1
    np.testing.assert_allclose(again[1]["phq8_score"],
                               out[0]["phq8_score"], atol=1e-6)
    np.testing.assert_allclose(again[0]["phq8_score"],
                               out[1]["phq8_score"], atol=1e-6)

    # zero-response participant is a clear error, not a NaN
    import pytest as _pytest
    with _pytest.raises(ValueError, match="zero segmented responses"):
        preg.predict_features([np.zeros((0, 1, 256), np.float32)])
    with _pytest.raises(ValueError, match="zero segmented responses"):
        preg.predict_signals([signals, []], [sr, sr])


def test_predict_daic_cli(tmp_path, capsys):
    import jax

    from icassp2022_depression_tpu import cli
    from icassp2022_depression_tpu.models import audio_net
    from icassp2022_depression_tpu.train import checkpoints

    queries, _, _ = _make_daic_corpus(tmp_path, pids=(305, 306))
    params = audio_net.init(jax.random.PRNGKey(2), daic.DAIC_CLF.model)
    ckpt = tmp_path / "daic_clf_0.70"
    checkpoints.save(ckpt, params)
    rc = cli.main(["predict-daic", "--task", "daic_clf",
                   "--daic-dir", str(tmp_path), "--ckpt", str(ckpt),
                   "--participant", "305", "--queries", str(queries)])
    assert rc == 0
    import json as _json
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["participant"] == 305 and out["label"] in (0, 1)


def test_daic_http_serving(tmp_path):
    """`cli serve --task daic_clf`'s HTTP front: POST /predict with
    ragged base64 responses per participant; micro-batching refused."""
    import base64
    import http.client
    import json
    import threading

    import jax
    import pytest

    from icassp2022_depression_tpu import serve
    from icassp2022_depression_tpu.models import audio_net

    params = audio_net.init(jax.random.PRNGKey(3), daic.DAIC_CLF.model)
    p = serve.DaicPredictor(params, "daic_clf")
    server = serve.make_http_server(p, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    rng = np.random.default_rng(3)

    def resp_b64(n):
        return base64.b64encode(np.round(
            rng.standard_normal(n) * 2000).astype(np.int16).tobytes()
        ).decode()

    body = json.dumps({"participants": [
        {"responses_b64": [resp_b64(8000), resp_b64(12000)], "sr": 16000},
        {"responses_b64": [resp_b64(5000)], "sr": 16000,
         "start_ordinal": 4},
    ]})
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/predict", body)
        r = conn.getresponse()
        assert r.status == 200
        results = json.loads(r.read())["results"]
        assert len(results) == 2
        assert all(x["label"] in (0, 1) for x in results)
        conn.request("POST", "/predict_stream", body)
        r = conn.getresponse()
        assert r.status == 404
        r.read()
        conn.request("GET", "/healthz")
        h = json.loads(conn.getresponse().read())
        assert h["ok"] and h["task"] == "daic_clf"
        assert h["latency"]["request"]["count"] >= 1
        assert h["cache"]["misses"] >= 1   # DAIC serving counts its LRU too
        conn.close()
    finally:
        server.shutdown()
        server.server_close()


def test_daic_micro_batching_coalesces():
    """Concurrent DAIC requests through --batch-window-ms coalesce into
    fewer ragged device batches; every client gets its own slice."""
    import base64
    import http.client
    import json
    import threading

    import jax

    from icassp2022_depression_tpu import serve
    from icassp2022_depression_tpu.models import audio_net

    params = audio_net.init(jax.random.PRNGKey(4), daic.DAIC_CLF.model)
    p = serve.DaicPredictor(params, "daic_clf")
    server = serve.make_http_server(p, port=0, batch_window_ms=700,
                                    max_batch=16)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def body(seed, n_resp):
        r = np.random.default_rng(seed)
        return json.dumps({"participants": [{
            "responses_b64": [base64.b64encode(np.round(
                r.standard_normal(6000 + 2000 * k) * 2000)
                .astype(np.int16).tobytes()).decode()
                for k in range(n_resp)],
            "sr": 16000}]})

    # bodies precomputed so thread start-up + b64 encoding cannot push a
    # request past the batch window (would flake the coalescing assert)
    bodies = {99: body(99, 2)}
    for i in range(4):
        bodies[i] = body(i, 1 + i % 3)

    def one(out, i, n_resp):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("POST", "/predict", bodies[i])
        out[i] = json.loads(conn.getresponse().read())
        conn.close()

    try:
        one({}, 99, 2)   # warm compiles outside the burst
        out: dict = {}
        threads = [threading.Thread(target=one, args=(out, i, 1 + i % 3))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(len(out[i]["results"]) == 1 for i in range(4))
        assert all(out[i]["results"][0]["label"] in (0, 1)
                   for i in range(4))
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/healthz")
        h = json.loads(conn.getresponse().read())
        b = h["batcher"]
        assert b["requests_served"] >= 5
        assert b["batches_run"] < b["requests_served"]  # coalesced
        conn.close()
    finally:
        server.shutdown()
        server.server_close()


def test_check_daic_reproduces_training_best(tmp_path):
    """check_daic on the gated-best checkpoint reproduces the
    training-time best eval metric exactly (same split, deterministic
    eval; padding-count differences are masked out)."""
    rng = np.random.default_rng(5)
    tr_f, tr_y = _ragged(20, rng)
    te_f, te_y = _ragged(8, rng)
    tcfg = C.replace(
        daic.DAIC_CLF,
        model=C.replace(daic.DAIC_CLF.model, embedding_size=16,
                        hidden_dims=16),
        optimizer=C.replace(daic.DAIC_CLF.optimizer, learning_rate=3e-2),
        epochs=11, batch_size=8)
    result = daic.train_daic(tr_f, tr_y, te_f, te_y, tcfg,
                             out_dir=tmp_path)
    assert result["best"]["epoch"] >= 0
    ckpts = sorted(tmp_path.glob("daic_clf_*.npz"))
    assert ckpts, list(tmp_path.iterdir())
    out = daic.check_daic(te_f, te_y, ckpts[0].with_suffix(""), tcfg)
    np.testing.assert_allclose(out["f1"], result["best"]["f1"], atol=1e-6)


def test_check_daic_cli(tmp_path, capsys):
    """extract-daic -> train-daic -> check-daic from the CLI."""
    import json

    from icassp2022_depression_tpu import cli

    queries, train_csv, test_csv = _make_daic_corpus(tmp_path)
    feats = tmp_path / "Features"
    assert cli.main(["extract-daic", "--daic-dir", str(tmp_path),
                     "--split-csv", str(train_csv), "--queries",
                     str(queries), "--out", str(feats),
                     "--split-name", "train"]) == 0
    assert cli.main(["extract-daic", "--daic-dir", str(tmp_path),
                     "--split-csv", str(test_csv), "--queries",
                     str(queries), "--out", str(feats),
                     "--split-name", "test"]) == 0
    import icassp2022_depression_tpu.train.daic as daic_mod
    import icassp2022_depression_tpu.config as C_mod
    orig = daic_mod.DAIC_CLF
    # enough optimisation to fit the single training participant, or the
    # gate's train_acc > 0 condition never admits a checkpoint
    daic_mod.DAIC_CLF = C_mod.replace(
        orig, epochs=16, batch_size=2,
        optimizer=C_mod.replace(orig.optimizer, learning_rate=3e-2),
        gate=C_mod.GateConfig(f1_floor=-1.0, train_acc_frac=0.0))
    try:
        assert cli.main(["train-daic", "--track", "clf", "--features",
                         str(feats), "--model-dir", str(tmp_path / "M")
                         ]) == 0
        ckpts = list((tmp_path / "M").glob("daic_clf_*.npz"))
        assert ckpts
        rc = cli.main(["check-daic", "--track", "clf", "--features",
                       str(feats), "--ckpt",
                       str(ckpts[0].with_suffix(""))])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert "f1" in out and "confusion_matrix" in out
    finally:
        daic_mod.DAIC_CLF = orig


def test_daic_http_auth_gate():
    """Bearer auth applies to the DAIC endpoint too (401 without the
    token, healthz open)."""
    import base64
    import http.client
    import json
    import threading

    import jax

    from icassp2022_depression_tpu import serve
    from icassp2022_depression_tpu.models import audio_net

    params = audio_net.init(jax.random.PRNGKey(6), daic.DAIC_CLF.model)
    p = serve.DaicPredictor(params, "daic_clf")
    server = serve.make_http_server(p, port=0, auth_token="tok")
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    rng = np.random.default_rng(6)
    body = json.dumps({"participants": [{
        "responses_b64": [base64.b64encode(np.round(
            rng.standard_normal(6000) * 2000).astype(np.int16).tobytes()
        ).decode()], "sr": 16000}]})
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/predict", body)
        r = conn.getresponse()
        assert r.status == 401
        r.read()
        conn.request("GET", "/healthz")
        r = conn.getresponse()
        assert r.status == 200
        r.read()
        conn.request("POST", "/predict", body,
                     {"Authorization": "Bearer tok"})
        r = conn.getresponse()
        assert r.status == 200
        assert json.loads(r.read())["results"][0]["label"] in (0, 1)
        conn.close()
    finally:
        server.shutdown()
        server.server_close()


def test_daic_predictor_multimodal_end_to_end(tmp_path, capsys):
    """train-daic --multimodal -> checkpoint -> DaicPredictor: the
    checkpoint's recorded embedding_size auto-enables multimodal serving,
    predict_participant concatenates audio + per-response text features
    exactly like extraction, and the audio-only signals path refuses."""
    import jax

    from icassp2022_depression_tpu import config as C, serve
    from icassp2022_depression_tpu.frontend import daic as daic_fe
    from icassp2022_depression_tpu.models import elmo

    queries, train_csv, test_csv = _make_daic_corpus(tmp_path)
    # depressed eval participant: the gate needs depressed-positive
    # f1 > 0, which a CE model fit on an all-depressed train split
    # reaches within a few epochs
    test_csv.write_text("Participant_ID,PHQ8_Binary,PHQ8_Score\n"
                        "301,1,14\n")
    ecfg = elmo.ElmoConfig(vocab_size=64, embed_dim=8, hidden=4, layers=1,
                           output_dim=8)
    feats = tmp_path / "Features"
    for name, csv_path in (("train", train_csv), ("test", test_csv)):
        daic_fe.extract_split_multimodal(
            tmp_path, csv_path, queries, elmo_cfg=ecfg, elmo_weights=None,
            out_prefix=feats, split_name=name)
    xa_tr, xt_tr, y_tr = daic_fe.load_features(feats, "train", "clf", True)
    xa_te, xt_te, y_te = daic_fe.load_features(feats, "test", "clf", True)
    x_tr = daic.concat_multimodal(xa_tr, xt_tr)
    x_te = daic.concat_multimodal(xa_te, xt_te)
    tcfg = C.replace(
        daic.DAIC_CLF, epochs=20, batch_size=2,
        # high lr overfits the single all-depressed train example fast,
        # so the depressed-positive f1 gate opens within a few epochs
        optimizer=C.replace(daic.DAIC_CLF.optimizer, learning_rate=1e-2),
        model=C.replace(daic.DAIC_CLF.model, embedding_size=264,
                        hidden_dims=16))
    daic.train_daic(x_tr, y_tr, x_te, y_te, tcfg,
                    out_dir=tmp_path / "Model")
    ckpts = list((tmp_path / "Model").glob("daic_clf_*.npz"))
    assert ckpts, "gated checkpoint expected on the separable toy corpus"
    ckpt = str(ckpts[0])[: -len(".npz")]

    p = serve.DaicPredictor.from_checkpoint(
        ckpt, "daic_clf", elmo_cfg=ecfg, elmo_weights=None)
    assert p.multimodal   # auto-detected from recorded embedding_size
    assert "serving it as a --multimodal model" in capsys.readouterr().err
    r = p.predict_participant(tmp_path, 300, queries_path=queries)
    assert set(r) == {"label", "depressed", "probs"}

    # serving features == training features: same model applied to the
    # extraction-side block must give the same probs
    want = p.predict_features([x_tr[0]])[0]
    np.testing.assert_allclose(r["probs"], want["probs"], atol=1e-5)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="transcripts are required"):
        p.predict_signals([[np.zeros(8000, np.float32)]], [16000])
    with _pytest.raises(ValueError, match="align 1:1"):
        p.predict_signals([[np.zeros(8000, np.float32)]], [16000],
                          texts_per_participant=[["a", "b"]])

    # the signals+texts path == the raw-session path for the same session
    transcript = daic_fe.read_transcript(
        tmp_path / "300_P" / "300_TRANSCRIPT.csv")
    wave, sr = daic_fe.read_wav(tmp_path / "300_P" / "300_AUDIO.wav")
    signals, texts = daic_fe.segment_responses(
        transcript, wave, sr, daic_fe.load_queries(queries),
        with_text=True)
    via_signals = p.predict_signals([signals], [sr],
                                    texts_per_participant=[texts])[0]
    np.testing.assert_allclose(via_signals["probs"], r["probs"],
                               atol=1e-5)

    # mismatched text embedder dims fail loudly at construction
    with _pytest.raises(ValueError, match="embedding_size"):
        serve.DaicPredictor.from_checkpoint(ckpt, "daic_clf",
                                            elmo_weights=None)


def test_daic_multimodal_http_serving(tmp_path):
    """Multimodal DAIC over HTTP: participants carry per-response texts;
    missing texts is a clear 400."""
    import base64
    import http.client
    import json
    import threading

    import jax

    from icassp2022_depression_tpu import config as C, serve
    from icassp2022_depression_tpu.models import audio_net, elmo

    ecfg = elmo.ElmoConfig(vocab_size=64, embed_dim=8, hidden=4, layers=1,
                           output_dim=8)
    tcfg = C.replace(
        daic.DAIC_CLF,
        model=C.replace(daic.DAIC_CLF.model, embedding_size=264,
                        hidden_dims=16))
    params = audio_net.init(jax.random.PRNGKey(5), tcfg.model)
    p = serve.DaicPredictor(params, "daic_clf", tcfg=tcfg,
                            multimodal=True, elmo_cfg=ecfg,
                            elmo_weights=None)
    server = serve.make_http_server(p, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    rng = np.random.default_rng(6)

    def resp_b64(n):
        return base64.b64encode(np.round(
            rng.standard_normal(n) * 2000).astype(np.int16).tobytes()
        ).decode()

    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        body = json.dumps({"participants": [
            {"responses_b64": [resp_b64(8000), resp_b64(12000)],
             "sr": 16000, "texts": ["pretty good", "not great honestly"]},
        ]})
        conn.request("POST", "/predict", body)
        r = conn.getresponse()
        assert r.status == 200
        results = json.loads(r.read())["results"]
        assert len(results) == 1 and results[0]["label"] in (0, 1)
        # texts missing -> 400 (KeyError surfaces as a client error)
        conn.request("POST", "/predict", json.dumps({"participants": [
            {"responses_b64": [resp_b64(4000)], "sr": 16000}]}))
        r = conn.getresponse()
        assert r.status == 400
        r.read()
        conn.close()
    finally:
        server.shutdown()
        server.server_close()


def test_daic_multimodal_micro_batching(tmp_path):
    """Concurrent multimodal DAIC requests coalesce with their texts
    carried through the merge (results match the unbatched path)."""
    import threading

    import jax

    from icassp2022_depression_tpu import config as C, serve
    from icassp2022_depression_tpu.models import audio_net, elmo

    ecfg = elmo.ElmoConfig(vocab_size=64, embed_dim=8, hidden=4, layers=1,
                           output_dim=8)
    tcfg = C.replace(
        daic.DAIC_CLF,
        model=C.replace(daic.DAIC_CLF.model, embedding_size=264,
                        hidden_dims=16))
    params = audio_net.init(jax.random.PRNGKey(7), tcfg.model)
    p = serve.DaicPredictor(params, "daic_clf", tcfg=tcfg,
                            multimodal=True, elmo_cfg=ecfg,
                            elmo_weights=None)
    rng = np.random.default_rng(8)
    reqs = []
    for i in range(3):
        n = int(rng.integers(1, 4))
        sigs = [np.round(rng.standard_normal(8000) * 2000).astype(np.int16)
                for _ in range(n)]
        texts = [f"response {i} {k}" for k in range(n)]
        reqs.append({"signals": [sigs], "srs": [16000], "starts": None,
                     "texts": [texts], "n": 1})
    want = [p.predict_signals(r["signals"], r["srs"], None, r["texts"])[0]
            for r in reqs]

    b = serve._DaicMicroBatcher(p, window_s=0.3, max_batch=8, max_queue=8)
    got = [None] * 3

    def worker(i):
        got[i] = b.submit(reqs[i])[0]

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for g, w in zip(got, want):
        np.testing.assert_allclose(g["probs"], w["probs"], atol=1e-5)


def test_daic_text_provenance_flows_to_serving(tmp_path, capsys):
    """extract-daic --multimodal records the text embedder/segmenter/seed;
    cli train-daic copies them into the checkpoint sidecar; from_checkpoint
    adopts segmenter+seed and warns loudly on an embedder-id mismatch."""
    import json

    from icassp2022_depression_tpu import cli, serve
    from icassp2022_depression_tpu.frontend import daic as daic_fe
    from icassp2022_depression_tpu.models import elmo
    from icassp2022_depression_tpu.train import checkpoints

    queries, train_csv, test_csv = _make_daic_corpus(tmp_path)
    feats = tmp_path / "F"
    ecfg = elmo.ElmoConfig(vocab_size=64, embed_dim=8, hidden=4, layers=1,
                           output_dim=8)
    daic_fe.extract_split_multimodal(
        tmp_path, train_csv, queries, elmo_cfg=ecfg, elmo_weights=None,
        seed=5, segmenter="fallback", out_prefix=feats, split_name="train")
    side = json.loads((feats / "extraction_meta.json").read_text())
    assert side["embedder"] == "prng:seed=5"
    assert side["segmenter"] == "fallback" and side["seed"] == 5

    # the cli trainer path copies the sidecar into checkpoint meta
    # (simulate the gated save with the same meta_extras mapping)
    params_meta = {"embedding_size": 264,
                   "text_embedder": "prng:seed=5",
                   "text_segmenter": "fallback", "text_seed": 5}
    import jax

    from icassp2022_depression_tpu import config as C
    from icassp2022_depression_tpu.models import audio_net

    tcfg = C.replace(daic.DAIC_CLF,
                     model=C.replace(daic.DAIC_CLF.model,
                                     embedding_size=264, hidden_dims=16))
    params = audio_net.init(jax.random.PRNGKey(0), tcfg.model)
    ckpt = tmp_path / "daic_clf_0.90"
    checkpoints.save(ckpt, params, params_meta)

    # matching embedder resolves silently; segmenter + seed adopted.
    # text dim must be 8 to make 264, so pass the extraction elmo_cfg
    p = serve.DaicPredictor.from_checkpoint(ckpt, "daic_clf",
                                            elmo_cfg=ecfg,
                                            elmo_weights=None)
    err = capsys.readouterr().err
    assert p.segmenter == "fallback" and p.embedder_id == "prng:seed=5"
    assert "WARNING" not in err and "adopting segmenter" in err

    # explicit mismatching seed -> embedder-id mismatch warns loudly
    p2 = serve.DaicPredictor.from_checkpoint(ckpt, "daic_clf",
                                             elmo_cfg=ecfg,
                                             elmo_weights=None, seed=0)
    err = capsys.readouterr().err
    assert p2.embedder_id == "prng:seed=0"
    assert "predictions will be meaningless" in err

    # cli flags map through the shared helper
    import argparse

    ns = argparse.Namespace(multimodal=True, elmo_weights="",
                            segmenter="fallback", embed_seed=7)
    kw = cli._daic_embedder_kw(ns)
    assert kw == {"multimodal": True, "elmo_weights": None,
                  "segmenter": "fallback", "seed": 7}


def test_daic_from_checkpoint_infers_dims_for_premeta(tmp_path, capsys):
    """Checkpoints saved before embedding_size meta existed: the input
    width is recovered from the stored [3H, emb] gate weights, so old
    multimodal checkpoints still serve."""
    import jax

    from icassp2022_depression_tpu import config as C, serve
    from icassp2022_depression_tpu.models import audio_net, elmo
    from icassp2022_depression_tpu.train import checkpoints

    ecfg = elmo.ElmoConfig(vocab_size=64, embed_dim=8, hidden=4, layers=1,
                           output_dim=8)
    tcfg = C.replace(daic.DAIC_CLF,
                     model=C.replace(daic.DAIC_CLF.model,
                                     embedding_size=264, hidden_dims=16))
    params = audio_net.init(jax.random.PRNGKey(1), tcfg.model)
    ckpt = tmp_path / "daic_clf_0.70"
    checkpoints.save(ckpt, params)  # NO meta sidecar at all
    p = serve.DaicPredictor.from_checkpoint(ckpt, "daic_clf",
                                            elmo_cfg=ecfg,
                                            elmo_weights=None)
    assert p.multimodal and p.tcfg.model.embedding_size == 264
    assert "serving it as a --multimodal model" in capsys.readouterr().err


def test_extract_split_fused_matches_per_participant(tmp_path):
    """extract_split (one fused extract_batch over the whole split) must
    be bit-identical to the per-participant oracle with the running
    cumulative ordinal (the pre-fusion semantics; bucketing is by each
    utterance's own padded length, so co-batching cannot change math)."""
    from icassp2022_depression_tpu.frontend import daic as daic_fe

    queries, train_csv, _ = _make_daic_corpus(tmp_path, pids=(300, 301))
    both_csv = tmp_path / "both_split.csv"
    both_csv.write_text("Participant_ID,PHQ8_Binary,PHQ8_Score\n"
                        "300,1,15\n301,0,3\n")
    feats, cl, rl = daic_fe.extract_split(tmp_path, both_csv, queries)
    assert cl == [1, 0] and rl == [15.0, 3.0]
    qs = daic_fe.load_queries(queries)
    ordinal = 0
    for pid, f in zip((300, 301), feats):
        ref = daic_fe.extract_participant(tmp_path, pid, qs,
                                          start_ordinal=ordinal)
        ordinal += len(ref)
        np.testing.assert_array_equal(f, ref)


def test_extract_split_device_and_fused_train_match_host(tmp_path):
    """The fused DAIC pipeline: extract_split_device's device-resident
    FlatResponses must carry the same rows as the host split, and
    train_daic on them must reproduce the host run exactly."""
    from icassp2022_depression_tpu.frontend import daic as daic_fe

    queries, train_csv, test_csv = _make_daic_corpus(tmp_path,
                                                     pids=(300, 301))
    host_tr, cl_tr, _ = daic_fe.extract_split(tmp_path, train_csv, queries)
    host_te, cl_te, _ = daic_fe.extract_split(tmp_path, test_csv, queries)
    dev_tr, dcl_tr, _ = daic_fe.extract_split_device(tmp_path, train_csv,
                                                     queries)
    dev_te, dcl_te, _ = daic_fe.extract_split_device(tmp_path, test_csv,
                                                     queries)
    assert isinstance(dev_tr, daic_fe.FlatResponses)
    assert isinstance(dev_tr.flat, jax.Array)
    assert dcl_tr == cl_tr and dcl_te == cl_te
    assert dev_tr.counts == [f.shape[0] for f in host_tr]
    np.testing.assert_array_equal(
        np.asarray(dev_tr.flat),
        np.concatenate([f[:, 0, :] for f in host_tr]))

    tcfg = C.replace(daic.DAIC_CLF, epochs=4, batch_size=2,
                     model=C.replace(daic.DAIC_CLF.model,
                                     embedding_size=256, hidden_dims=16))
    host = daic.train_daic(host_tr, cl_tr, host_te, cl_te, tcfg, seed=0)
    dev = daic.train_daic(dev_tr, dcl_tr, dev_te, dcl_te, tcfg, seed=0)
    np.testing.assert_array_equal(host["logs"]["loss"], dev["logs"]["loss"])
    for k in ("f1", "epoch"):
        assert host["best"][k] == dev["best"][k]


def test_pad_flat_responses_device_matches_host():
    """Device gather pad == host pad_responses, incl. a zero-response
    participant (all-zero mask row, zeros features)."""
    from icassp2022_depression_tpu.frontend.daic import (FlatResponses,
                                                         pad_responses)

    rng = np.random.default_rng(0)
    counts = [3, 0, 2]
    flat = rng.standard_normal((5, 8)).astype(np.float32)
    blocks, pos = [], 0
    for c in counts:
        blocks.append(flat[pos:pos + c][:, None, :])
        pos += c
    hx, hm = pad_responses(blocks, 4)
    dx, dm = daic.pad_flat_responses_device(
        FlatResponses(jnp.asarray(flat), counts), 4)
    np.testing.assert_array_equal(np.asarray(dx), hx)
    np.testing.assert_array_equal(dm, hm)


def test_train_daic_fused_cli(tmp_path, capsys):
    """train-daic --daic-dir (fused extract->train) must print the same
    best metrics as the two-step extract-daic -> train-daic --features
    path, and reject the unsupported flag combinations."""
    import json

    import pytest

    from icassp2022_depression_tpu import cli
    import icassp2022_depression_tpu.train.daic as daic_mod
    import icassp2022_depression_tpu.config as C_mod

    queries, train_csv, test_csv = _make_daic_corpus(tmp_path)
    feats = tmp_path / "Features"
    for name, csvp in (("train", train_csv), ("test", test_csv)):
        assert cli.main(["extract-daic", "--daic-dir", str(tmp_path),
                         "--split-csv", str(csvp), "--queries",
                         str(queries), "--out", str(feats),
                         "--split-name", name]) == 0
    orig = daic_mod.DAIC_CLF
    daic_mod.DAIC_CLF = C_mod.replace(
        orig, epochs=16, batch_size=2,
        optimizer=C_mod.replace(orig.optimizer, learning_rate=3e-2),
        gate=C_mod.GateConfig(f1_floor=-1.0, train_acc_frac=0.0))
    try:
        assert cli.main(["train-daic", "--track", "clf", "--features",
                         str(feats)]) == 0
        two_step = json.loads(capsys.readouterr().out.strip()
                              .splitlines()[-1])
        assert cli.main(["train-daic", "--track", "clf",
                         "--daic-dir", str(tmp_path),
                         "--train-csv", str(train_csv),
                         "--eval-csv", str(test_csv),
                         "--queries", str(queries),
                         "--model-dir", str(tmp_path / "MF")]) == 0
        fused = json.loads(capsys.readouterr().out.strip()
                           .splitlines()[-1])
        assert fused == two_step
        assert list((tmp_path / "MF").glob("daic_clf_*.npz"))
        assert not (tmp_path / "Features2").exists()

        with pytest.raises(SystemExit):
            cli.main(["train-daic", "--track", "clf",
                      "--daic-dir", str(tmp_path),
                      "--train-csv", str(train_csv),
                      "--eval-csv", str(test_csv), "--multimodal"])
        with pytest.raises(SystemExit):
            cli.main(["train-daic", "--track", "clf",
                      "--daic-dir", str(tmp_path)])
        with pytest.raises(SystemExit):
            cli.main(["train-daic", "--track", "clf",
                      "--daic-dir", str(tmp_path),
                      "--train-csv", str(train_csv),
                      "--eval-csv", str(test_csv),
                      "--features", str(feats)])
        with pytest.raises(SystemExit):
            cli.main(["train-daic", "--track", "clf"])
    finally:
        daic_mod.DAIC_CLF = orig


def test_extract_split_multimodal_fused_matches_per_participant(tmp_path):
    """The fused multimodal split pass (one audio extract_batch + one text
    embed call for the WHOLE split) must equal the per-participant oracle
    with running cumulative ordinals, both modalities."""
    from icassp2022_depression_tpu.frontend import daic as daic_fe
    from icassp2022_depression_tpu.frontend import text as text_fe
    from icassp2022_depression_tpu.models import elmo

    queries, _, _ = _make_daic_corpus(tmp_path, pids=(300, 301))
    both_csv = tmp_path / "both_split.csv"
    both_csv.write_text("Participant_ID,PHQ8_Binary,PHQ8_Score\n"
                        "300,1,15\n301,0,3\n")
    ecfg = elmo.ElmoConfig(vocab_size=64, embed_dim=8, hidden=4, layers=1,
                           output_dim=8)
    a, t, cl, rl = daic_fe.extract_split_multimodal(
        tmp_path, both_csv, queries, elmo_cfg=ecfg, elmo_weights=None)
    assert cl == [1, 0] and rl == [15.0, 3.0]
    qs = daic_fe.load_queries(queries)
    embed, _ = text_fe.make_embedder(None, ecfg, 0, elmo_weights=None)
    ordinal = 0
    for pid, af, tf in zip((300, 301), a, t):
        ra, rt = daic_fe.extract_participant_multimodal(
            tmp_path, pid, qs, None, ecfg, start_ordinal=ordinal,
            embed_fn=embed)
        ordinal += len(ra)
        np.testing.assert_array_equal(af, ra)
        np.testing.assert_array_equal(tf, rt)


def test_check_daic_no_npz_loop(tmp_path, capsys):
    """train-daic --daic-dir -> check-daic --daic-dir: the whole DAIC
    train+check loop from a raw directory with no npz artifacts, with the
    training-time best reproduced exactly."""
    import json

    import pytest

    from icassp2022_depression_tpu import cli
    import icassp2022_depression_tpu.train.daic as daic_mod
    import icassp2022_depression_tpu.config as C_mod

    queries, train_csv, _ = _make_daic_corpus(tmp_path)
    # an eval split with BOTH labels so F1 is non-degenerate (a positive
    # prediction exists -> no 0/0 nan-vs-guarded-0.0 ambiguity)
    eval_csv = tmp_path / "eval_split.csv"
    eval_csv.write_text("Participant_ID,PHQ8_Binary,PHQ8_Score\n"
                        "300,1,15\n301,0,3\n")
    orig = daic_mod.DAIC_CLF
    daic_mod.DAIC_CLF = C_mod.replace(
        orig, epochs=16, batch_size=2,
        optimizer=C_mod.replace(orig.optimizer, learning_rate=3e-2),
        gate=C_mod.GateConfig(f1_floor=-1.0, train_acc_frac=0.0))
    try:
        assert cli.main(["train-daic", "--track", "clf",
                         "--daic-dir", str(tmp_path),
                         "--train-csv", str(train_csv),
                         "--eval-csv", str(eval_csv),
                         "--queries", str(queries),
                         "--model-dir", str(tmp_path / "M")]) == 0
        trained = json.loads(capsys.readouterr().out.strip()
                             .splitlines()[-1])
        ckpts = list((tmp_path / "M").glob("daic_clf_*.npz"))
        assert ckpts
        assert cli.main(["check-daic", "--track", "clf",
                         "--daic-dir", str(tmp_path),
                         "--eval-csv", str(eval_csv),
                         "--queries", str(queries),
                         "--ckpt", str(ckpts[0])[:-4]]) == 0
        checked = json.loads(capsys.readouterr().out.strip()
                             .splitlines()[-1])
        assert not np.isnan(checked["f1"])
        assert checked["f1"] == pytest.approx(trained["f1"], abs=1e-6)
        with pytest.raises(SystemExit):
            cli.main(["check-daic", "--track", "clf",
                      "--ckpt", str(ckpts[0])[:-4]])
        with pytest.raises(SystemExit):
            cli.main(["check-daic", "--track", "clf",
                      "--daic-dir", str(tmp_path),
                      "--ckpt", str(ckpts[0])[:-4]])
    finally:
        daic_mod.DAIC_CLF = orig

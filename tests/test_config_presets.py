"""The six presets must carry the reference config dicts verbatim —
executable documentation of config.py's central claim (values cited from
the reference files named in each assertion)."""

from icassp2022_depression_tpu import config as C


def test_audio_clf_preset():  # Classification/audio_gru_whole.py:110-121
    t = C.AUDIO_CLF
    assert (t.model.num_classes, t.model.dropout, t.model.rnn_layers) == (2, 0.5, 2)
    assert (t.model.embedding_size, t.model.hidden_dims) == (256, 256)
    assert t.model.bidirectional is False and t.model.cell == "gru"
    assert (t.batch_size, t.epochs) == (8, 170)
    assert t.optimizer.learning_rate == 6e-6
    assert t.optimizer.name == "adamw" and t.optimizer.weight_decay == 1e-5
    assert t.gate.f1_floor == 0.5 and t.gate.train_acc_frac == 0.9
    assert t.gate.f1_tie_update and t.gate.train_acc_strict


def test_text_clf_preset():  # Classification/text_bilstm_whole.py:247-258
    t = C.TEXT_CLF
    assert (t.model.embedding_size, t.model.hidden_dims) == (1024, 128)
    assert t.model.bidirectional is True and t.model.cell == "lstm"
    assert (t.batch_size, t.epochs) == (4, 150)
    assert t.optimizer.learning_rate == 1e-5
    assert t.model.init == "xavier"
    assert t.model.head_input_dropout is False  # fc_out has no leading Dropout


def test_fuse_clf_preset():  # Classification/fuse_net_whole.py:398-411,513
    f, t = C.FUSE_CLF, C.FUSE_CLF_TRAINER
    assert (f.audio_embed_size, f.text_embed_size) == (256, 1024)
    assert (f.audio_hidden_dims, f.text_hidden_dims) == (256, 128)
    assert f.dropout == 0.3 and f.num_classes == 2
    assert f.modal_attention is False and f.audio_layernorm is True
    assert (t.batch_size, t.epochs) == (2, 100)
    assert t.optimizer.name == "adam" and t.optimizer.learning_rate == 8e-6
    assert t.gate.f1_floor == 0.61
    assert not t.gate.f1_tie_update and not t.gate.train_acc_strict


def test_audio_reg_preset():  # Regression/audio_bilstm_perm.py:32-43,203
    t = C.AUDIO_REG
    assert t.model.num_classes == 1 and t.model.input_layernorm is False
    assert t.model.pooling == "sum" and t.model.head_activation == "relu"
    assert (t.batch_size, t.epochs) == (2, 120)
    assert t.optimizer.name == "adam" and t.optimizer.learning_rate == 1e-5
    assert t.loss == "l1"
    assert t.gate.mae_ceiling == 8.5 and t.gate.train_mae_ceiling == 13.0


def test_text_reg_preset():  # Regression/text_bilstm_perm.py:24-35
    t = C.TEXT_REG
    assert (t.model.embedding_size, t.model.hidden_dims) == (1024, 128)
    assert (t.batch_size, t.epochs) == (2, 110)
    assert t.loss == "smooth_l1"
    assert t.model.head_input_dropout is True  # reg fc_out leads with Dropout


def test_fuse_reg_preset():  # Regression/fuse_net.py:36-49,448
    f, t = C.FUSE_REG, C.FUSE_REG_TRAINER
    assert f.num_classes == 1 and f.dropout == 0.5
    assert f.modal_attention is True and f.audio_layernorm is False
    assert f.head_activation == "relu"
    assert (t.batch_size, t.epochs) == (4, 150)
    assert t.optimizer.learning_rate == 8e-5
    assert t.gate.mae_ceiling == 8.2


def test_frontend_and_fold_presets():
    fe = C.FrontendConfig()  # audio_features_whole.py:34,57-72,105-110
    assert (fe.n_fft, fe.hop_length, fe.n_mels) == (2048, 512, 80)
    assert fe.netvlad_clusters == 16 and fe.netvlad_output_dim == 256
    assert fe.log_floor == 1e-6
    assert fe.silence_amplitude == 1e-4 and fe.silence_seconds == 5
    fo = C.FoldConfig()  # audio_gru_whole.py:270,290; audio_bilstm_perm.py:215-225
    assert fo.train_perm_ids == (0, 1, 2, 3, 4, 5)
    assert fo.test_perm_ids == (0, 1, 4, 5)
    assert (fo.reg_test_dep, fo.reg_test_non) == (10, 44)
    assert fo.reg_augment_first_n == 14
    assert fo.sds_threshold == 53.0

"""Permutation augmentation verified against an oracle that replays the
reference's mutable vstack-growth algorithm (array grows across the fold,
index lists select rows), proving the functional implementation selects
identical train/test sample sets in identical order."""

import itertools

import numpy as np

from icassp2022_depression_tpu.data import augment


def _clf_oracle(features, targets, train_idxs_tmp, dep_idxs, non_idxs):
    """Replay of the reference fold loop (audio_gru_whole.py:264-298
    semantics) on copies."""
    features = features.copy()
    targets = targets.copy()
    dep = set(dep_idxs.tolist())
    test_idxs_tmp = [i for i in sorted(set(dep_idxs.tolist()) | set(non_idxs.tolist()))
                     if i not in set(train_idxs_tmp.tolist())]
    train_idxs, test_idxs = [], []
    for idx in train_idxs_tmp:
        if idx in dep:
            feat = features[idx]
            count = 0
            for p in itertools.permutations(feat, feat.shape[0]):
                if count in [0, 1, 2, 3, 4, 5]:
                    features = np.vstack((features, np.expand_dims(list(p), 0)))
                    targets = np.hstack((targets, 1))
                    train_idxs.append(len(features) - 1)
                count += 1
        else:
            train_idxs.append(idx)
    for idx in test_idxs_tmp:
        if idx in dep:
            feat = features[idx]
            count = 0
            for p in itertools.permutations(feat, feat.shape[0]):
                if count in [0, 1, 4, 5]:
                    features = np.vstack((features, np.expand_dims(list(p), 0)))
                    targets = np.hstack((targets, 1))
                    test_idxs.append(len(features) - 1)
                count += 1
        else:
            test_idxs.append(idx)
    return (features[train_idxs], targets[train_idxs],
            features[test_idxs], targets[test_idxs])


def test_classification_augmentation_matches_reference_algorithm():
    rng = np.random.default_rng(0)
    n, d = 20, 5
    features = rng.standard_normal((n, 3, d)).astype(np.float32)
    targets = (rng.random(n) < 0.4).astype(np.int64)
    dep_idxs = np.where(targets == 1)[0]
    non_idxs = np.where(targets == 0)[0]
    all_idxs = rng.permutation(n)
    train_idxs_tmp = all_idxs[:13]

    xo_tr, yo_tr, xo_te, yo_te = _clf_oracle(
        features, targets, train_idxs_tmp, dep_idxs, non_idxs)
    (xs_tr, y_tr), (xs_te, y_te) = augment.augment_classification_fold(
        [features], targets, train_idxs_tmp, dep_idxs, non_idxs)

    np.testing.assert_array_equal(xs_tr[0], xo_tr)
    np.testing.assert_array_equal(y_tr, yo_tr)
    np.testing.assert_array_equal(xs_te[0], xo_te)
    np.testing.assert_array_equal(y_te, yo_te)


def test_fusion_lockstep_permutation():
    rng = np.random.default_rng(1)
    n = 10
    audio = rng.standard_normal((n, 3, 4)).astype(np.float32)
    text = rng.standard_normal((n, 3, 6)).astype(np.float32)
    targets = np.array([1, 0] * 5)
    dep_idxs = np.where(targets == 1)[0]
    non_idxs = np.where(targets == 0)[0]
    train_idxs = np.arange(6)
    (feats, y), _ = augment.augment_classification_fold(
        [audio, text], targets, train_idxs, dep_idxs, non_idxs)
    a_aug, t_aug = feats
    # depressed speaker 0 expands to 6 rows; each row's audio and text carry
    # the SAME permutation (lockstep zip semantics)
    for row in range(6):
        perm = augment.PERMS[row]
        np.testing.assert_array_equal(a_aug[row], audio[0][list(perm)])
        np.testing.assert_array_equal(t_aug[row], text[0][list(perm)])


def _reg_oracle(features, targets, train_dep_tmp, train_non, test_dep,
                test_non, first_n=14):
    """Replay of the reference regression fold loop
    (audio_bilstm_perm.py:221-241 semantics) on copies."""
    features = features.copy()
    targets = targets.copy()
    train_dep_idxs = []
    for (i, idx) in enumerate(train_dep_tmp):
        feat = features[idx]
        if i < first_n:
            for p in itertools.permutations(feat, feat.shape[0]):
                features = np.vstack((features, np.expand_dims(list(p), 0)))
                targets = np.hstack((targets, targets[idx]))
                train_dep_idxs.append(len(features) - 1)
        else:
            train_dep_idxs.append(idx)
    train_idxs = train_dep_idxs + list(train_non)
    test_idxs = list(test_dep) + list(test_non)
    return (features[train_idxs], targets[train_idxs],
            features[test_idxs], targets[test_idxs])


def test_regression_augmentation_matches_reference_algorithm():
    rng = np.random.default_rng(4)
    n, d = 30, 5
    features = rng.standard_normal((n, 3, d)).astype(np.float32)
    targets = rng.uniform(20, 80, n).astype(np.float32)
    dep = np.where(targets >= 53)[0]
    non = np.where(targets < 53)[0]
    train_dep, test_dep = dep[:-3], dep[-3:]
    train_non, test_non = non[:-5], non[-5:]
    first_n = 4

    xo_tr, yo_tr, xo_te, yo_te = _reg_oracle(
        features, targets, list(train_dep), list(train_non),
        list(test_dep), list(test_non), first_n)
    (xs_tr, y_tr), (xs_te, y_te) = augment.augment_regression_fold(
        [features], targets, train_dep, train_non, test_dep, test_non,
        augment_first_n=first_n)
    np.testing.assert_array_equal(xs_tr[0], xo_tr)
    np.testing.assert_array_equal(y_tr, yo_tr)
    np.testing.assert_array_equal(xs_te[0], xo_te)
    np.testing.assert_array_equal(y_te, yo_te)


def test_regression_augmentation_first_n_and_label_copy():
    rng = np.random.default_rng(2)
    n = 40
    features = rng.standard_normal((n, 3, 4)).astype(np.float32)
    targets = rng.uniform(20, 80, n).astype(np.float32)
    dep = np.where(targets >= 53)[0]
    non = np.where(targets < 53)[0]
    train_dep, train_non = dep[:-3], non[:-5]
    test_dep, test_non = dep[-3:], non[-5:]
    first_n = 2
    (feats, y_tr), (test_feats, y_te) = augment.augment_regression_fold(
        [features], targets, train_dep, train_non, test_dep, test_non,
        augment_first_n=first_n)
    x_tr = feats[0]
    # first 2 dep speakers -> 6 rows each with copied (not constant) targets
    assert x_tr.shape[0] == len(train_dep) - first_n + 6 * first_n + len(train_non)
    np.testing.assert_allclose(y_tr[:6], targets[train_dep[0]])
    np.testing.assert_allclose(y_tr[6:12], targets[train_dep[1]])
    # remaining dep speakers pass through unaugmented, original order
    np.testing.assert_array_equal(x_tr[12], features[train_dep[2]])
    # test split untouched
    assert test_feats[0].shape[0] == len(test_dep) + len(test_non)
    np.testing.assert_array_equal(test_feats[0][0], features[test_dep[0]])
    np.testing.assert_allclose(y_te[0], targets[test_dep[0]])

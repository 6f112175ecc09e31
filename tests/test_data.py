"""Dataset pipeline tests on synthetic fixtures: Brennan2018 (fake .mat/.wav),
Gwilliams2022 (array-BIDS tree), preproc cache contract, onset parsing,
samplers."""

import json
import os

import numpy as np
import pytest

import fixtures
from speech_decoding_tpu.data.gwilliams2022 import (
    ArrayBIDSSource,
    Gwilliams2022DeepSplit,
    Gwilliams2022SentenceSplit,
    Gwilliams2022ShallowSplit,
    continuous,
    parse_annotations,
)
from speech_decoding_tpu.data.preproc_cache import check_preprocs, mark_done
from speech_decoding_tpu.data.sampling import (
    iter_shuffled_batches,
    iter_updates_batches,
    random_split,
)


@pytest.fixture(scope="module")
def brennan_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("brennan"))
    fixtures.make_brennan_tree(root)
    return root


@pytest.fixture(scope="module")
def gwilliams_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("gwilliams"))
    fixtures.make_gwilliams_tree(root, missing=((1, 1),))
    return root


@pytest.fixture(scope="module")
def w2v():
    return fixtures.tiny_wav2vec()


class TestOnsetLogic:
    def test_continuous_stitching(self):
        onsets = np.array([0.0, 1.0, 2.5, 0.2, 1.1, 0.3])
        out = continuous(onsets.copy())
        np.testing.assert_allclose(out, [0.0, 1.0, 2.5, 2.7, 3.6, 3.9])

    def test_parse_annotations_filters_words(self):
        desc = [
            {"start": 0.1, "kind": "phoneme", "sequence_id": 0},
            {"start": 0.1, "kind": "word", "sequence_id": 0},
            {"start": 0.5, "kind": "word", "sequence_id": 1},
            "{'start': 0.6, 'kind': 'phoneme', 'sequence_id': 1}",
        ]
        idxs, onsets, sents = parse_annotations(desc)
        np.testing.assert_array_equal(idxs, [1, 2])
        np.testing.assert_allclose(onsets, [0.1, 0.5])
        np.testing.assert_array_equal(sents, [0, 1])


class TestPreprocCache:
    def test_match_and_stage_flags(self, tmp_path):
        d = str(tmp_path) + os.sep
        pre = {"a": 1, "b": [1, 2]}
        flags, dir0 = check_preprocs(pre, d)
        assert flags == {"x_done": False, "y_done": False}
        flags = mark_done(pre, dir0, "x_done")
        assert flags["x_done"] and not flags["y_done"]
        # same params -> same dir with persisted stage flags
        flags2, dir1 = check_preprocs(pre, d)
        assert dir1 == dir0 and flags2["x_done"]
        # different params -> new numbered dir
        _, dir2 = check_preprocs({"a": 2, "b": [1, 2]}, d)
        assert dir2 != dir0


class TestBrennan:
    def test_end_to_end_build_and_sample(self, brennan_root, w2v):
        from speech_decoding_tpu.data.brennan2018 import Brennan2018Dataset

        cfg = fixtures.make_config(brennan_root, "Brennan2018")
        cfg.rebuild_dataset = True
        ds = Brennan2018Dataset(cfg, wav2vec=w2v)
        assert ds.num_subjects == 4
        assert len(ds) > 3
        # embeddings and EEG share the segment grid
        assert ds.X.shape[-1] == ds.Y.shape[-1]
        assert ds.X.shape[1] == 60
        # the EEG rate is DERIVED from the audio-embedding length
        # [ref: brennan2018.py:269-270]; with the tiny test wav2vec (conv
        # stride 20 instead of 320) it lands near 1916 Hz, not 120 Hz
        assert ds.srate > 0

        rng = np.random.default_rng(0)
        seg = np.arange(3)
        batch = ds.sample_batch(rng, seg)
        chunk_ids = seg  # chunk ids == segment ids, unique by construction
        assert batch["X"].shape == (3, 60, ds.seq_len_samp)
        assert batch["Y"].shape[0] == 3 and batch["Y"].shape[-1] == ds.seq_len_samp
        assert np.unique(chunk_ids).size == 3
        # baseline correction: first 0.5 s mean per channel ~ 0
        base = batch["X"][..., : ds.baseline_len_samp].mean(-1)
        np.testing.assert_allclose(base, 0.0, atol=1e-4)
        # robust scaling + clamp applied
        assert np.abs(batch["X"]).max() <= cfg.preprocs["clamp_lim"]

    REAL_DATASETS_MAT = "/root/reference/data/Brennan2018/datasets.mat"

    @pytest.mark.skipif(
        not os.path.exists(REAL_DATASETS_MAT),
        reason="real Brennan2018 metadata not present on this image",
    )
    def test_excluded_subjects_match_real_metadata(self):
        """Golden vs the REAL Brennan2018 distribution metadata: the authors'
        ``datasets.mat`` ships ``high_noise`` + ``low_perf`` + ``use`` subject
        lists; our hardcoded ``EXCLUDED_SUBJECTS`` [ref: brennan2018.py:216-233]
        must equal the union of the two exclusion lists, and the complement
        must equal the 33 subjects the authors marked usable."""
        import scipy.io

        from speech_decoding_tpu.data.brennan2018 import EXCLUDED_SUBJECTS

        m = scipy.io.loadmat(self.REAL_DATASETS_MAT)

        def names(a):
            return {str(x[0]).removesuffix(".mat") for x in a.ravel()}

        excluded_real = names(m["high_noise"]) | names(m["low_perf"])
        assert set(EXCLUDED_SUBJECTS) == excluded_real
        all_subjects = {f"S{i:02d}" for i in range(1, 50)}
        assert all_subjects - set(EXCLUDED_SUBJECTS) == names(m["use"])
        assert len(names(m["use"])) == 33  # [ref: brennan2018.py:284-287]

    def test_cache_reuse(self, brennan_root, w2v):
        from speech_decoding_tpu.data.brennan2018 import Brennan2018Dataset

        cfg = fixtures.make_config(brennan_root, "Brennan2018")
        cfg.rebuild_dataset = False
        ds = Brennan2018Dataset(cfg, wav2vec=w2v)  # loads the npz caches
        assert ds.num_subjects == 4


class TestGwilliams:
    def _cfg(self, root):
        cfg = fixtures.make_config(root, "Gwilliams2022")
        return cfg

    def test_shallow_build(self, gwilliams_root, w2v):
        cfg = self._cfg(gwilliams_root)
        cfg.rebuild_dataset = True
        ds = Gwilliams2022ShallowSplit(
            cfg, wav2vec=w2v, num_subjects=2, num_sessions=2, num_tasks=2
        )
        # (subj1 x 2 sessions + subj2 x 1 session) present; sess (1,1) missing
        assert ds.num_subjects == 2
        assert len(ds.X) == 3  # session keys
        assert len(ds) == sum(ds.num_segments_foreach_task)
        assert ds.Y.shape[1:] == (ds.Y.shape[1], 360)

        rng = np.random.default_rng(0)
        batch = ds.sample_batch(rng, np.arange(4))
        assert batch["X"].shape == (4, 208, 360)
        assert batch["Y"].shape[0] == 4
        assert set(batch["subject_idxs"]) <= {0, 1}

    def test_cache_and_sentence_split(self, gwilliams_root, w2v):
        cfg = self._cfg(gwilliams_root)
        np.random.seed(0)
        train = Gwilliams2022SentenceSplit(
            cfg, wav2vec=w2v, num_subjects=2, num_sessions=2, num_tasks=2
        )
        test = Gwilliams2022SentenceSplit(
            cfg,
            test_word_idxs_dict=train.test_word_idxs_dict,
            wav2vec=w2v,
            num_subjects=2,
            num_sessions=2,
            num_tasks=2,
        )
        assert train.num_subjects == test.num_subjects
        # split partitions the word set per task
        total = len(train) + len(test)
        full = Gwilliams2022ShallowSplit(
            cfg, wav2vec=w2v, num_subjects=2, num_sessions=2, num_tasks=2
        )
        assert total == len(full)
        # no overlap between train/test word indices
        for task, test_idxs in train.test_word_idxs_dict.items():
            assert len(set(test_idxs)) == len(test_idxs)

    def test_deep_split(self, gwilliams_root, w2v):
        cfg = self._cfg(gwilliams_root)
        train = Gwilliams2022DeepSplit(
            cfg, train=True, wav2vec=w2v, num_subjects=2, num_sessions=2, num_tasks=2
        )
        test = Gwilliams2022DeepSplit(
            cfg, train=False, wav2vec=w2v, num_subjects=2, num_sessions=2, num_tasks=2
        )
        for i, (a, b) in enumerate(
            zip(train.num_segments_foreach_task, test.num_segments_foreach_task)
        ):
            assert a + b == 24  # n_words_per_task in the fixture

    def test_raw_source_missing_recording(self, gwilliams_root):
        src = ArrayBIDSSource(os.path.join(gwilliams_root, "data", "Gwilliams2022"))
        assert src.read(1, 1, 0) is None  # the (1,1) session is missing
        out = src.read(0, 0, 0)
        assert out is not None
        meg, m_on, s_on, s_idx = out
        assert meg.shape[0] == 224
        assert len(m_on) == len(s_on) == len(s_idx) == 24


class TestSampling:
    def test_random_split(self):
        rng = np.random.default_rng(0)
        tr, te = random_split(100, 0.8, rng)
        assert len(tr) == 80 and len(te) == 20
        assert set(tr) | set(te) == set(range(100))

    def test_updates_batches(self):
        rng = np.random.default_rng(0)
        batches = list(iter_updates_batches(np.arange(50), 8, 10, rng))
        assert len(batches) == 10
        for b in batches:
            assert len(b) == 8 and np.unique(b).size == 8  # unique within batch

    def test_shuffled_batches(self):
        rng = np.random.default_rng(0)
        batches = list(iter_shuffled_batches(np.arange(20), 8, rng))
        got = np.concatenate(batches)
        assert sorted(got.tolist()) == sorted(set(got.tolist()))


class TestMemoryEfficientMode:
    def test_mmap_and_inram_batches_identical(self, tmp_path, w2v):
        """memory_efficient=True (mmap parts, shift folded into onsets) and
        =False (in-RAM dict, sliced X) must produce identical batches."""
        root = str(tmp_path)
        fixtures.make_gwilliams_tree(root)
        base = fixtures.make_config(root, "Gwilliams2022")
        base.rebuild_dataset = True

        cfg_mm = base.copy()
        cfg_mm.memory_efficient = True
        ds_mm = Gwilliams2022ShallowSplit(
            cfg_mm, wav2vec=w2v, num_subjects=2, num_sessions=2, num_tasks=2
        )
        cfg_ram = base.copy()
        cfg_ram.memory_efficient = False
        cfg_ram.rebuild_dataset = False  # reuse the parts/caches
        ds_ram = Gwilliams2022ShallowSplit(
            cfg_ram, wav2vec=w2v, num_subjects=2, num_sessions=2, num_tasks=2
        )
        assert len(ds_mm) == len(ds_ram)
        # mmap mode keeps X memory-mapped
        any_x = next(iter(ds_mm.X.values()))["task0"]
        assert isinstance(any_x, np.memmap)

        b1 = ds_mm.sample_batch(np.random.default_rng(7), np.arange(6))
        b2 = ds_ram.sample_batch(np.random.default_rng(7), np.arange(6))
        for k in ("X", "Y", "subject_idxs", "scale_stats"):
            np.testing.assert_allclose(b1[k], b2[k], rtol=1e-6, atol=1e-6, err_msg=k)


class TestDeviceResident:
    def test_device_gather_matches_host_sample_batch(self, gwilliams_root, w2v):
        """The device-resident path must produce batches identical to the
        host path for the same RNG state."""
        from speech_decoding_tpu.data.device_resident import DeviceResidentGwilliams

        cfg = fixtures.make_config(gwilliams_root, "Gwilliams2022")
        ds = Gwilliams2022ShallowSplit(
            cfg, wav2vec=w2v, num_subjects=2, num_sessions=2, num_tasks=2
        )
        batcher = DeviceResidentGwilliams(ds)

        seg = np.arange(8)
        host = ds.sample_batch(np.random.default_rng(11), seg)
        idx = batcher.make_index_batch(np.random.default_rng(11), seg)
        dev = {k: np.asarray(v) for k, v in batcher.gather(idx).items()}

        for k in ("X", "Y", "subject_idxs", "scale_stats"):
            np.testing.assert_allclose(dev[k], host[k], rtol=1e-6, atol=1e-6, err_msg=k)

    def test_channels_last_gather(self, gwilliams_root, w2v):
        from speech_decoding_tpu.data.device_resident import DeviceResidentGwilliams

        cfg = fixtures.make_config(gwilliams_root, "Gwilliams2022")
        ds = Gwilliams2022ShallowSplit(
            cfg, wav2vec=w2v, num_subjects=2, num_sessions=2, num_tasks=2
        )
        b_cf = DeviceResidentGwilliams(ds, channels_last=False)
        b_cl = DeviceResidentGwilliams(ds, channels_last=True)
        seg = np.arange(6)
        d1 = {k: np.asarray(v) for k, v in b_cf.gather(
            b_cf.make_index_batch(np.random.default_rng(3), seg)).items()}
        d2 = {k: np.asarray(v) for k, v in b_cl.gather(
            b_cl.make_index_batch(np.random.default_rng(3), seg)).items()}
        np.testing.assert_allclose(d2["X"].transpose(0, 2, 1), d1["X"], rtol=1e-6)
        np.testing.assert_allclose(d2["Y"].transpose(0, 2, 1), d1["Y"], rtol=1e-6)
        np.testing.assert_array_equal(d2["subject_idxs"], d1["subject_idxs"])

    def test_int16_storage_matches_f32(self, gwilliams_root, w2v):
        """store_dtype=int16: half the HBM of f32 with per-(array, channel)
        scales dequantized inside the jitted gather; batches match f32 to
        ~1/32766 of the channel range, in both layouts."""
        import jax.numpy as jnp

        from speech_decoding_tpu.data.device_resident import DeviceResidentGwilliams

        cfg = fixtures.make_config(gwilliams_root, "Gwilliams2022")
        ds = Gwilliams2022ShallowSplit(
            cfg, wav2vec=w2v, num_subjects=2, num_sessions=2, num_tasks=2
        )
        seg = np.arange(6)
        for cl in (False, True):
            b32 = DeviceResidentGwilliams(ds, channels_last=cl)
            b16 = DeviceResidentGwilliams(
                ds, store_dtype=jnp.int16, channels_last=cl
            )
            assert b16.X_stack.dtype == jnp.int16 and b16.Y_stack.dtype == jnp.int16
            d32 = {k: np.asarray(v) for k, v in b32.gather(
                b32.make_index_batch(np.random.default_rng(5), seg)).items()}
            d16 = {k: np.asarray(v) for k, v in b16.gather(
                b16.make_index_batch(np.random.default_rng(5), seg)).items()}
            for k in ("X", "Y"):
                span = np.abs(d32[k]).max()
                np.testing.assert_allclose(
                    d16[k], d32[k], atol=1.5 * span / 32766.0, err_msg=f"{k} cl={cl}"
                )
            np.testing.assert_array_equal(d16["subject_idxs"], d32["subject_idxs"])
            np.testing.assert_array_equal(d16["scale_stats"], d32["scale_stats"])


class TestDropOverlappingWords:
    """The reference documents this filter but leaves it a TODO stub
    [ref: gwilliams2022.py:690-697]; here it is implemented behind
    preprocs.drop_overlap_sec (None = stub parity)."""

    def test_stub_parity_default(self):
        from speech_decoding_tpu.data.gwilliams2022 import drop_overlapping_words

        idxs = np.array([0, 1, 2])
        ons = np.array([0.0, 1.0, 2.0])
        sent = np.array([0, 0, 1])
        out = drop_overlapping_words(idxs, ons, sent)  # min_gap_sec=None
        for a, b in zip(out, (idxs, ons, sent)):
            np.testing.assert_array_equal(a, b)

    def test_documented_semantics(self):
        from speech_decoding_tpu.data.gwilliams2022 import drop_overlapping_words

        # sentence 0: words at 0.0, 1.0, 2.5 ; sentence 1 starts at 4.0 with
        # words 4.0, 4.5 ; sentence 2 starts at 9.0
        ons = np.array([0.0, 1.0, 2.5, 4.0, 4.5, 9.0])
        sent = np.array([0, 0, 0, 1, 1, 2])
        idxs = np.arange(6)
        k_idx, k_ons, k_sent = drop_overlapping_words(idxs, ons, sent, 3.0)
        # word at 2.5 has only 1.5 s to sentence-1 onset (4.0) -> dropped;
        # 1.0 has exactly 3 s ("less than" boundary) -> kept; last sentence
        # has no following onset -> kept
        np.testing.assert_array_equal(k_idx, [0, 1, 3, 4, 5])
        np.testing.assert_array_equal(k_ons, [0.0, 1.0, 4.0, 4.5, 9.0])
        np.testing.assert_array_equal(k_sent, [0, 0, 1, 1, 2])

    def test_wired_through_source(self, gwilliams_root):
        import os

        from speech_decoding_tpu.data.gwilliams2022 import ArrayBIDSSource

        root = os.path.join(gwilliams_root, "data", "Gwilliams2022")
        plain = ArrayBIDSSource(root).read(0, 0, 0)
        filtered = ArrayBIDSSource(root, drop_overlap_sec=3.0).read(0, 0, 0)
        assert plain is not None and filtered is not None
        # filtering can only remove onsets, never add
        assert len(filtered[1]) <= len(plain[1])
        assert set(np.asarray(filtered[2])).issubset(set(np.asarray(plain[2])))


class TestSentenceSplitRNGContract:
    """VERDICT r3 item 6: the sentence split must be a pure function of the
    run's resolved seed — NOT of whatever consumed the global numpy RNG
    first (import order, earlier draws). Legacy flag restores the
    reference's global-RNG coupling (golden-tested elsewhere)."""

    def _cfg(self, root, **over):
        import fixtures

        cfg = fixtures.make_config(root, "Gwilliams2022")
        for k, v in over.items():
            cfg.set_path(k, v)
        return cfg

    def _split(self, root, w2v, **over):
        from speech_decoding_tpu.data.gwilliams2022 import Gwilliams2022SentenceSplit

        cfg = self._cfg(root, **over)
        ds = Gwilliams2022SentenceSplit(
            cfg, wav2vec=w2v, num_subjects=2, num_sessions=2, num_tasks=2
        )
        return {t: sorted(v) for t, v in ds.test_word_idxs_dict.items()}

    def test_split_independent_of_global_rng(self, gwilliams_root, w2v):
        np.random.seed(0)
        a = self._split(gwilliams_root, w2v, resolved_seed=7)
        np.random.seed(999)
        np.random.random(1234)  # a hostile earlier global-RNG consumer
        b = self._split(gwilliams_root, w2v, resolved_seed=7)
        assert a == b
        # and the split DOES respond to the resolved seed
        c = self._split(gwilliams_root, w2v, resolved_seed=8)
        assert c != a

    def test_resolved_seed_zero_is_a_real_seed(self, gwilliams_root, w2v):
        """resolved_seed=0 is a legitimate os.urandom draw; it must NOT be
        treated as missing and silently fall back to `seed` (regression:
        the falsy `or` made a 0-seed run's split irreproducible from its
        recorded resolved_seed)."""
        a = self._split(gwilliams_root, w2v, resolved_seed=0, seed=1)
        b = self._split(gwilliams_root, w2v, resolved_seed=0, seed=2)
        assert a == b  # `seed` must not leak into the split
        c = self._split(gwilliams_root, w2v, resolved_seed=1, seed=1)
        assert c != a  # and 0 is an actual seed value, not "unset"

    def test_legacy_flag_restores_global_rng_coupling(self, gwilliams_root, w2v):
        np.random.seed(0)
        a = self._split(
            gwilliams_root, w2v, resolved_seed=7, split_legacy_global_rng=True
        )
        np.random.seed(0)
        b = self._split(
            gwilliams_root, w2v, resolved_seed=8, split_legacy_global_rng=True
        )
        assert a == b  # legacy: driven by the global stream, not the seed
        np.random.seed(4)
        c = self._split(
            gwilliams_root, w2v, resolved_seed=7, split_legacy_global_rng=True
        )
        assert c != a

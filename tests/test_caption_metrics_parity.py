"""Caption scorer parity vs the reference's VENDORED pycocoevalcap code
(evaluator/capeval/{bleu,rouge,cider} — pure python, imported directly).

The clean-room BLEU-4 / ROUGE-L / CIDEr-D implementations in
eval/caption_metrics.py must reproduce the vendored scorers' numbers, since
Scan2Cap results are reported in these units.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def capeval():
    from _ref_stubs import install
    install()
    import importlib
    bleu = importlib.import_module("evaluator.capeval.bleu.bleu")
    rouge = importlib.import_module("evaluator.capeval.rouge.rouge")
    cider = importlib.import_module("evaluator.capeval.cider.cider")
    return bleu.Bleu(4), rouge.Rouge(), cider.Cider()


WORDS = ("sos the a red blue chair table lamp is on next to near wooden "
         "small large eos door window shelf").split()


def _corpus(rng, n_items=12):
    preds, refs = {}, {}
    for i in range(n_items):
        k = f"item{i}"
        ln = rng.integers(3, 12)
        preds[k] = [" ".join(rng.choice(WORDS, ln))]
        refs[k] = [" ".join(rng.choice(WORDS, rng.integers(3, 12)))
                   for _ in range(int(rng.integers(1, 4)))]
        if rng.random() < 0.3:     # some exact matches
            preds[k] = [refs[k][0]]
    return preds, refs


def test_caption_scorers_match_vendored(capeval):
    from pq3d_tpu.eval.caption_metrics import (cider_d, corpus_bleu, rouge_l)
    bleu_s, rouge_s, cider_s = capeval
    rng = np.random.default_rng(11)
    preds, refs = _corpus(rng)

    ref_bleu, _ = bleu_s.compute_score(refs, preds)
    ref_rouge, _ = rouge_s.compute_score(refs, preds)
    ref_cider, _ = cider_s.compute_score(refs, preds)

    our_bleu, _ = corpus_bleu(preds, refs)
    np.testing.assert_allclose(our_bleu, ref_bleu, rtol=1e-6)
    np.testing.assert_allclose(rouge_l(preds, refs), ref_rouge, rtol=1e-6)
    np.testing.assert_allclose(cider_d(preds, refs), ref_cider, rtol=1e-6)


def test_caption_scorers_match_vendored_empty_preds(capeval):
    """Scan2Cap scores missing-object entries with empty captions
    (ref scan2cap_eval.py:27-73) — the scorers must agree there too."""
    from pq3d_tpu.eval.caption_metrics import cider_d, corpus_bleu, rouge_l
    bleu_s, rouge_s, cider_s = capeval
    rng = np.random.default_rng(5)
    preds, refs = _corpus(rng, 8)
    for i, k in enumerate(preds):
        if i % 3 == 0:
            preds[k] = ["sos eos"]

    ref_bleu, _ = bleu_s.compute_score(refs, preds)
    ref_rouge, _ = rouge_s.compute_score(refs, preds)
    ref_cider, _ = cider_s.compute_score(refs, preds)
    our_bleu, _ = corpus_bleu(preds, refs)
    np.testing.assert_allclose(our_bleu, ref_bleu, rtol=1e-6)
    np.testing.assert_allclose(rouge_l(preds, refs), ref_rouge, rtol=1e-6)
    np.testing.assert_allclose(cider_d(preds, refs), ref_cider, rtol=1e-6)


def test_clean_answer_matches_reference():
    """Gen-QA answer normalization parity vs the reference's clean_answer
    (data/data_utils.py:450-507) on a battery of tricky strings."""
    from _ref_stubs import install
    install()
    import importlib
    ref = importlib.import_module("data.data_utils")
    from pq3d_tpu.eval.text_utils import clean_answer

    cases = [
        "The Red Chair.", "it's on the table", "there are 3 chairs",
        "  spaces   everywhere  ", "don't know", "a dog; a cat",
        "twenty-two", "N/A", "yes!", "next to the window, on the left",
        "the chair's leg", "CANNOT answer", "1", "on top of the shelf.",
        "behind you", "two", "tv stand", "whiteboard",
    ]
    for s in cases:
        assert clean_answer(s) == ref.clean_answer(s), s


def test_voxel_hashes_match_reference():
    """fnv/ravel hashes and voxelize-with-inverse grouping parity vs the
    reference's pure-numpy data/voxelize.py."""
    from _ref_stubs import install
    install()
    import importlib
    ref = importlib.import_module("data.voxelize")
    from pq3d_tpu.ops import voxelize as ours

    rng = np.random.default_rng(0)
    coords = rng.integers(-40, 40, (2000, 3))
    np.testing.assert_array_equal(ours.fnv_hash(coords.astype(np.int64)),
                                  ref.fnv_hash_vec(coords.copy()))
    np.testing.assert_array_equal(ours.ravel_hash(coords.astype(np.int64)),
                                  ref.ravel_hash_vec(coords.astype(
                                      np.float64)))

    # grouping semantics: same unique voxel SET and consistent inverse
    pts = rng.standard_normal((3000, 3)).astype(np.float32) * 2
    vox, uniq, inv = ours.quantize(pts, 0.1)
    ref_uniq, ref_inv = ref.voxelize_and_inverse(
        np.floor(pts / 0.1).astype(np.int64), hash_type="ravel")
    assert len(uniq) == len(ref_uniq)
    # every point maps to the same voxel as its group representative
    grid = np.floor(pts / 0.1).astype(np.int64)
    np.testing.assert_array_equal(grid[uniq][inv], grid)
    # identical PARTITIONS (representative choice may differ: ours mirrors
    # ME.sparse_quantize first-occurrence, the data path the reference uses)
    remap = -np.ones(len(ref_uniq), np.int64)
    remap[ref_inv] = inv
    np.testing.assert_array_equal(remap[ref_inv], inv)

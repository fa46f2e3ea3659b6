"""Caption metrics: corpus BLEU-4, ROUGE-L, CIDEr-D (pure numpy/python).

Clean-room implementations of the standard algorithms used by the
reference's vendored scorers (reference: evaluator/capeval/{bleu,rouge,
cider}) for Scan2Cap evaluation.  METEOR requires a Java jar in the
reference (evaluator/capeval/meteor/meteor.py:20-27) and is optional here.

All functions take ``preds: dict[key, [caption]]`` and
``refs: dict[key, [captions...]]`` with pre-tokenized (whitespace) strings,
matching the pycocoevalcap calling convention.
"""
from __future__ import annotations

import math
from collections import Counter, defaultdict
from typing import Dict, List, Tuple


def _ngrams(tokens: List[str], n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


# ---------------------------------------------------------------------------
# BLEU
# ---------------------------------------------------------------------------

def corpus_bleu(preds: Dict, refs: Dict, max_n: int = 4
                ) -> Tuple[List[float], Dict[str, List[float]]]:
    """Corpus-level BLEU-1..4 with clipping + closest-length brevity penalty."""
    clipped = [0] * max_n
    totals = [0] * max_n
    pred_len, ref_len = 0, 0
    for k, ps in preds.items():
        p = ps[0].split()
        rs = [r.split() for r in refs[k]]
        pred_len += len(p)
        ref_len += min((abs(len(r) - len(p)), len(r)) for r in rs)[1]
        for n in range(1, max_n + 1):
            pg = _ngrams(p, n)
            max_ref = Counter()
            for r in rs:
                rg = _ngrams(r, n)
                for g, c in rg.items():
                    max_ref[g] = max(max_ref[g], c)
            totals[n - 1] += sum(pg.values())
            clipped[n - 1] += sum(min(c, max_ref[g]) for g, c in pg.items())
    precisions = [clipped[i] / totals[i] if totals[i] else 0.0
                  for i in range(max_n)]
    bp = 1.0 if pred_len > ref_len else \
        math.exp(1 - ref_len / max(pred_len, 1))
    bleus = []
    for n in range(1, max_n + 1):
        if min(precisions[:n]) > 0:
            gm = math.exp(sum(math.log(p) for p in precisions[:n]) / n)
        else:
            gm = 0.0
        bleus.append(bp * gm)
    return bleus, {}


# ---------------------------------------------------------------------------
# ROUGE-L
# ---------------------------------------------------------------------------

def _lcs_len(a: List[str], b: List[str]) -> int:
    if not a or not b:
        return 0
    dp = [0] * (len(b) + 1)
    for x in a:
        prev = 0
        for j, y in enumerate(b, 1):
            cur = dp[j]
            dp[j] = prev + 1 if x == y else max(dp[j], dp[j - 1])
            prev = cur
    return dp[-1]


def rouge_l(preds: Dict, refs: Dict, beta: float = 1.2) -> float:
    scores = []
    for k, ps in preds.items():
        p = ps[0].split()
        best = 0.0
        for r in refs[k]:
            rt = r.split()
            lcs = _lcs_len(p, rt)
            prec = lcs / max(len(p), 1)
            rec = lcs / max(len(rt), 1)
            if prec and rec:
                f = ((1 + beta ** 2) * prec * rec) / (rec + beta ** 2 * prec)
            else:
                f = 0.0
            best = max(best, f)
        scores.append(best)
    return sum(scores) / max(len(scores), 1)


# ---------------------------------------------------------------------------
# CIDEr-D
# ---------------------------------------------------------------------------

def meteor(preds: Dict, refs: Dict, jar_path: str = None) -> float:
    """Optional METEOR via the benchmark's Java jar when present
    (the reference shells out to meteor-1.5.jar,
    evaluator/capeval/meteor/meteor.py:20-27).  Returns nan when no jar/JVM
    is available — METEOR is optional in this framework."""
    import os
    import shutil
    import subprocess
    jar = jar_path or os.environ.get("METEOR_JAR", "")
    if not jar or not os.path.exists(jar) or not shutil.which("java"):
        return float("nan")
    lines_test, lines_ref = [], []
    for k in preds:
        lines_test.append(preds[k][0])
        lines_ref.append(refs[k][0])
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".tst", delete=False) as ft, \
            tempfile.NamedTemporaryFile("w", suffix=".ref", delete=False) as fr:
        ft.write("\n".join(lines_test))
        fr.write("\n".join(lines_ref))
        tst, ref = ft.name, fr.name
    out = subprocess.run(["java", "-jar", jar, tst, ref, "-norm"],
                         capture_output=True, text=True, timeout=600)
    for line in reversed(out.stdout.splitlines()):
        if line.lower().startswith("final score"):
            return float(line.split(":")[1])
    return float("nan")


def cider_d(preds: Dict, refs: Dict, max_n: int = 4, sigma: float = 6.0
            ) -> float:
    # document frequencies from the reference corpus
    df = [defaultdict(float) for _ in range(max_n)]
    for k, rs in refs.items():
        for n in range(1, max_n + 1):
            seen = set()
            for r in rs:
                seen.update(_ngrams(r.split(), n).keys())
            for g in seen:
                df[n - 1][g] += 1
    log_m = math.log(max(len(refs), 1))

    def tfidf_vec(tokens: List[str], n: int):
        # raw term frequency * idf (matches pycocoevalcap CIDEr-D, which
        # does NOT normalize counts by ngram total)
        cnt = _ngrams(tokens, n)
        vec = {}
        norm = 0.0
        for g, c in cnt.items():
            idf = log_m - math.log(max(df[n - 1][g], 1.0))
            w = c * idf
            vec[g] = w
            norm += w * w
        return vec, math.sqrt(norm), len(tokens)

    scores = []
    for k, ps in preds.items():
        p = ps[0].split()
        score_n = []
        for n in range(1, max_n + 1):
            pv, pn, pl = tfidf_vec(p, n)
            s = 0.0
            for r in refs[k]:
                rt = r.split()
                rv, rn, rl = tfidf_vec(rt, n)
                # clipped cosine (CIDEr-D clips pred counts to ref)
                num = sum(min(pv.get(g, 0), rv[g]) * rv[g] for g in rv)
                if pn and rn:
                    sim = num / (pn * rn)
                else:
                    sim = 0.0
                delta = pl - rl
                sim *= math.exp(-(delta ** 2) / (2 * sigma ** 2))
                s += sim
            score_n.append(s / max(len(refs[k]), 1))
        scores.append(10.0 * sum(score_n) / max_n)
    return sum(scores) / max(len(scores), 1)

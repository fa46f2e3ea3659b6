"""METEOR-lite (clean-room Porter stemmer + staged exact/stem alignment).

The reference shells out to meteor-1.5.jar (evaluator/capeval/meteor/
meteor.py:20-27); meteor_lite is the always-available pure-python
approximation reported alongside it.
"""
import math

from pq3d_tpu.eval.caption_metrics import meteor_lite, porter_stem


def test_porter_stem_known_cases():
    # classic cases from Porter (1980)
    cases = {
        "caresses": "caress", "ponies": "poni", "ties": "ti",
        "caress": "caress", "cats": "cat", "feed": "feed",
        "agreed": "agre", "plastered": "plaster", "bled": "bled",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop",
        "falling": "fall", "hissing": "hiss", "fizzed": "fizz",
        "failing": "fail", "filing": "file", "happy": "happi",
        "sky": "sky", "relational": "relat", "conditional": "condit",
        "rational": "ration", "valenci": "valenc", "digitizer": "digit",
        "operator": "oper", "feudalism": "feudal", "hopefulness": "hope",
        "formaliti": "formal", "triplicate": "triplic", "formative": "form",
        "formalize": "formal",
        # full-pipeline outputs: step 4 further strips "-ic" at m>1
        "electriciti": "electr", "electrical": "electr",
        "hopeful": "hope", "goodness": "good",
        "revival": "reviv", "allowance": "allow", "inference": "infer",
        "airliner": "airlin", "adjustable": "adjust", "defensible": "defens",
        "irritant": "irrit", "replacement": "replac", "adjustment": "adjust",
        "dependent": "depend", "adoption": "adopt", "homologou": "homolog",
        "communism": "commun", "activate": "activ", "angulariti": "angular",
        "homologous": "homolog", "effective": "effect", "bowdlerize":
        "bowdler", "probate": "probat", "rate": "rate", "cease": "ceas",
        "controll": "control", "roll": "roll",
    }
    wrong = {w: (porter_stem(w), want) for w, want in cases.items()
             if porter_stem(w) != want}
    assert not wrong, wrong


def test_meteor_lite_orderings():
    refs = {"a": ["the red chair is next to the table"]}
    perfect = meteor_lite({"a": ["the red chair is next to the table"]}, refs)
    shuffled = meteor_lite({"a": ["table the to next is chair red the"]}, refs)
    partial = meteor_lite({"a": ["the red chair"]}, refs)
    unrelated = meteor_lite({"a": ["quantum flux capacitors everywhere"]},
                            refs)
    assert perfect > shuffled > unrelated
    assert perfect > partial > unrelated
    assert 0.9 < perfect <= 1.0
    assert unrelated < 0.05


def test_meteor_lite_stem_matching():
    refs = {"a": ["a man running quickly"]}
    stemmed = meteor_lite({"a": ["a man runs quick"]}, refs)
    nothing = meteor_lite({"a": ["b dog walk slow"]}, refs)
    assert stemmed > nothing
    # stem matches carry weight 0.6 < exact weight 1.0
    exact = meteor_lite({"a": ["a man running quickly"]}, refs)
    assert exact > stemmed


def test_meteor_lite_multi_reference_and_empty():
    refs = {"a": ["a cat sits", "a dog sits"], "b": ["something"]}
    s = meteor_lite({"a": ["a dog sits"], "b": [""]}, refs)
    assert 0 < s < 1
    assert not math.isnan(meteor_lite({}, {}) + 0) or True
    assert math.isnan(meteor_lite({}, {}))

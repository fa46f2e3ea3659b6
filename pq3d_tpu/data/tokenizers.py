"""Tokenizer wiring: HF CLIP/T5 tokenizers when available, synthetic
fallback otherwise.

The reference couples tokenizer choice to the text encoder and generation
head (reference: trainer/build.py:84-94 picks the CLIP tokenizer for
CLIPLanguageEncoder, data/datasets/scanfamily_wrapper.py:8-45 pre-tokenizes
sentences, trainer/multitask_trainer.py:138-145 decodes T5 output).  Here
the config keys ``data_wrapper.tokenizer`` / ``data_wrapper.
generation_tokenizer`` name HF tokenizers; in a zero-egress environment
without an HF cache we fall back to the synthetic closed-vocabulary
tokenizer so the full stack still runs (with a loud warning).
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Callable, List, Optional

log = logging.getLogger(__name__)


def _synthetic_tokenize(s: str) -> List[int]:
    """Deterministic hash tokenizer over a 1000-id space (dev fallback)."""
    return [ord(c) % 1000 for c in s][:77]


@dataclasses.dataclass
class TokenizerBundle:
    """Prompt tokenizer (text -> ids), generation tokenizer (response text
    -> ids for T5 teacher forcing) and detokenizer (ids -> text)."""
    tokenize: Callable[[str], List[int]]
    gen_tokenize: Callable[[str], List[int]]
    detokenize: Callable[[object], str]
    prompt_name: str = "synthetic"
    gen_name: str = "synthetic"

    @property
    def is_real(self) -> bool:
        return self.prompt_name != "synthetic" and self.gen_name != "synthetic"


def _load_hf(name: Optional[str]):
    if not name:
        return None
    try:
        from transformers import AutoTokenizer
        return AutoTokenizer.from_pretrained(str(name))
    except Exception as e:  # offline / no cache / bad name
        log.warning("HF tokenizer %r unavailable (%s: %s) — falling back to "
                    "the synthetic tokenizer; real-data text will NOT be in "
                    "the model's vocab space", name, type(e).__name__,
                    str(e)[:120])
        return None


def build_tokenizers(cfg) -> TokenizerBundle:
    """Resolve tokenizers from ``cfg.data_wrapper`` (dead-config fix: these
    keys now actually reach the datasets)."""
    dw = cfg.get("data_wrapper", {}) or {}
    prompt_name = dw.get("tokenizer") if hasattr(dw, "get") else None
    gen_name = dw.get("generation_tokenizer") if hasattr(dw, "get") else None

    prompt_tok = _load_hf(prompt_name)
    gen_tok = _load_hf(gen_name)

    if prompt_tok is not None:
        def tokenize(s: str, _t=prompt_tok) -> List[int]:
            return list(_t(s, truncation=True, max_length=77).input_ids)
        p_name = str(prompt_name)
    else:
        tokenize, p_name = _synthetic_tokenize, "synthetic"

    if gen_tok is not None:
        def gen_tokenize(s: str, _t=gen_tok) -> List[int]:
            return list(_t(s, truncation=True, max_length=64).input_ids)

        def detokenize(ids, _t=gen_tok) -> str:
            import numpy as np
            ids = [int(i) for i in np.asarray(ids).tolist() if int(i) > 0]
            return _t.decode(ids, skip_special_tokens=True)
        g_name = str(gen_name)
    else:
        from pq3d_tpu.data.unified_datasets import detokenize as _syn_detok
        gen_tokenize, detokenize, g_name = (_synthetic_tokenize, _syn_detok,
                                            "synthetic")

    return TokenizerBundle(tokenize=tokenize, gen_tokenize=gen_tokenize,
                           detokenize=detokenize, prompt_name=p_name,
                           gen_name=g_name)

"""Property fuzz for the pure-Python text surfaces.

The contracts the Spark plans lean on: the charset decoder NEVER raises
(it feeds non-nullable ingest columns), the robots parser terminates
and returns its typed triple on any crawled bytes, CCNet hash
normalization is idempotent (a shadow column built twice must agree),
and both tokenizers' segmentations concatenate back to the input (a
lossy segmentation would silently corrupt token counts and packing).
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

FUZZ = settings(
    max_examples=150,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)


@FUZZ
@given(blob=st.one_of(st.binary(max_size=400), st.none()))
def test_decode_html_never_raises(blob):
    from metadata_crawler_spark.functions.charset import decode_html_py

    text, charset = decode_html_py(blob)
    assert isinstance(text, str)
    assert isinstance(charset, str)


@FUZZ
@given(
    body=st.text(max_size=400),
    agent=st.sampled_from(["mdc", "googlebot", "*", "A-B_c", ""]),
)
def test_parse_robots_typed_on_arbitrary_text(body, agent):
    from metadata_crawler_spark.functions.robots import parse_robots_txt

    allow, disallow, delay_ms = parse_robots_txt(body, agent)
    assert isinstance(allow, list) and isinstance(disallow, list)
    assert all(isinstance(p, str) for p in allow + disallow)
    assert isinstance(delay_ms, int) and delay_ms >= 0


@FUZZ
@given(text=st.text(max_size=300))
def test_ccnet_normalize_idempotent(text):
    from metadata_crawler_spark.functions.text import ccnet_normalize_py

    once = ccnet_normalize_py(text)
    assert ccnet_normalize_py(once) == once


@FUZZ
@given(
    word=st.text(
        st.characters(min_codepoint=33, max_codepoint=0x2FF),
        min_size=1, max_size=24,
    ),
    seed=st.integers(0, 2**31 - 1),
    n_merges=st.integers(0, 12),
)
def test_bpe_encode_concatenates_back(word, seed, n_merges):
    """Whatever the merge table says, BPE segmentation is a partition of
    word + EOW — token counts and packing budgets depend on it."""
    import random

    from metadata_crawler_spark.operators.bpe import EOW, _encode_word

    rng = random.Random(seed)
    # random merge ranks over symbols actually present (plus noise pairs)
    syms = list(word) + [EOW]
    ranks = {}
    for r in range(n_merges):
        a = rng.choice(syms)
        b = rng.choice(syms)
        ranks.setdefault((a, b), len(ranks))
        # grown symbols can merge further
        syms.append(a + b)
    toks = _encode_word(word, ranks)
    assert "".join(toks) == word + EOW


@FUZZ
@given(
    word=st.text(
        st.characters(min_codepoint=33, max_codepoint=0x2FF),
        min_size=1, max_size=20,
    ),
    seed=st.integers(0, 2**31 - 1),
)
def test_unigram_viterbi_concatenates_back(word, seed):
    import random

    from metadata_crawler_spark.operators.unigram_lm import _viterbi

    rng = random.Random(seed)
    # vocabulary: every char of the word (so it is segmentable) plus a
    # few random multi-char pieces at random log-probs
    logp = {c: math.log(rng.uniform(0.01, 0.5)) for c in set(word)}
    for _ in range(6):
        i = rng.randrange(len(word))
        j = min(len(word), i + rng.randrange(2, 5))
        if j > i:
            logp[word[i:j]] = math.log(rng.uniform(0.01, 0.5))
    max_len = max(len(p) for p in logp)
    pieces = _viterbi(word, logp, max_len)
    assert pieces is not None
    assert "".join(pieces) == word


@FUZZ
@given(word=st.text(max_size=20), seed=st.integers(0, 2**31 - 1))
def test_unigram_viterbi_unsegmentable_is_none(word, seed):
    """A vocabulary missing one of the word's chars must yield None
    (the encoder isolates those as <unk>), never a wrong partition."""
    import random

    from metadata_crawler_spark.operators.unigram_lm import _viterbi

    chars = sorted(set(word))
    if not chars:
        return
    rng = random.Random(seed)
    missing = rng.choice(chars)
    logp = {c: math.log(0.1) for c in chars if c != missing}
    if not logp:
        # single-distinct-char word: the vocab must be non-empty but must
        # not contain the word's char (word='\x00' would make a literal
        # '\0' fallback segmentable again) — pick a control char the
        # <=20-char word provably doesn't contain
        fb = next(c for c in map(chr, range(32)) if c not in chars)
        logp = {fb: math.log(0.5)}
    pieces = _viterbi(word, logp, max(len(p) for p in logp))
    assert pieces is None

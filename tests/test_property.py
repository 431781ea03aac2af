"""Property-based tests (hypothesis) over the pure kernels — the invariants
the distributed stages rely on but example-based tests can't sweep:
canonicalization idempotence/stability, text-normalizer idempotence,
cuckoo-filter no-false-negatives + checkpoint round-trip, MinHash's
Jaccard-estimate concentration.  No Ray involved: these are the functions
every map_batches stage calls per row, so their contracts must hold on
arbitrary input, not just fixture corpora."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from langscrape_ray.frontier.canonical import canonicalize_url, url_hash64
from langscrape_ray.frontier.cuckoo import CuckooFilter
from langscrape_ray.kernel.textops import (
    collapse_dots,
    collapse_whitespace,
    normalize_text,
    remove_control_characters,
)

# --------------------------------------------------------------------------
# canonicalize_url
# --------------------------------------------------------------------------

_host = st.from_regex(r"[a-z0-9]([a-z0-9-]{0,20}[a-z0-9])?(\.[a-z]{2,6}){1,2}",
                      fullmatch=True)
_path = st.from_regex(r"(/[a-zA-Z0-9._~-]{0,12}){0,4}", fullmatch=True)
_query = st.from_regex(r"([a-z]{1,6}=[a-zA-Z0-9]{0,8}(&[a-z]{1,6}=[a-zA-Z0-9]{0,8}){0,3})?",
                       fullmatch=True)


@given(scheme=st.sampled_from(["http", "https", "HTTP", "Https"]),
       host=_host, path=_path, query=_query,
       fragment=st.text(alphabet=string.ascii_lowercase, max_size=6))
@settings(max_examples=150, deadline=None)
def test_canonicalize_idempotent(scheme, host, path, query, fragment):
    url = f"{scheme}://{host}{path}"
    if query:
        url += f"?{query}"
    if fragment:
        url += f"#{fragment}"
    out = canonicalize_url(url)
    assert out is not None
    canon, h = out
    # idempotence: canonicalizing a canonical URL is the identity
    again = canonicalize_url(canon)
    assert again is not None
    assert again[0] == canon
    assert again[1] == h
    # host is the lowercased hostname
    assert h == host.lower().rstrip(".")
    # fragments and scheme case never survive
    assert "#" not in canon
    assert canon.startswith(("http://", "https://"))


@given(st.text(max_size=40))
@settings(max_examples=150, deadline=None)
def test_canonicalize_never_raises(junk):
    out = canonicalize_url(junk)  # arbitrary junk: None or a valid pair
    if out is not None:
        assert canonicalize_url(out[0]) is not None


@given(_host, st.sampled_from(["", ":80", ":443", ":8080"]))
@settings(max_examples=60, deadline=None)
def test_default_port_stripped(host, port):
    a = canonicalize_url(f"http://{host}{port}/x")
    assert a is not None
    if port in ("", ":80"):
        assert a[0] == f"http://{host}/x"
    # stable hash: same canonical -> same 64-bit key
    assert url_hash64(a[0]) == url_hash64(canonicalize_url(a[0])[0])


# --------------------------------------------------------------------------
# text normalizers
# --------------------------------------------------------------------------

@given(st.text(max_size=200))
@settings(max_examples=150, deadline=None)
def test_normalize_text_idempotent(s):
    once = normalize_text(s)
    assert normalize_text(once) == once


@given(st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_collapse_whitespace_idempotent(s):
    once = collapse_whitespace(s)
    assert collapse_whitespace(once) == once
    assert "  " not in once


@given(st.text(alphabet=". abc\n", max_size=120))
@settings(max_examples=100, deadline=None)
def test_collapse_dots_no_runs(s):
    assert ".." not in collapse_dots(s)


@given(st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_remove_control_characters_stable(s):
    once = remove_control_characters(s)
    assert remove_control_characters(once) == once


# --------------------------------------------------------------------------
# cuckoo filter
# --------------------------------------------------------------------------

@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                min_size=1, max_size=300, unique=True))
@settings(max_examples=60, deadline=None)
def test_cuckoo_no_false_negatives(keys):
    f = CuckooFilter(capacity=1024)
    for k in keys:
        assert f.add(k)
    for k in keys:
        assert f.contains(k)  # a cuckoo filter NEVER false-negatives


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                min_size=1, max_size=200, unique=True))
@settings(max_examples=40, deadline=None)
def test_cuckoo_checkpoint_roundtrip(keys):
    f = CuckooFilter(capacity=512)
    for k in keys:
        f.add(k)
    g = CuckooFilter.from_state(f.state())
    for k in keys:
        assert g.contains(k)
    # deterministic rebuild: byte-identical membership decisions
    probe = [(k * 0x9E3779B97F4A7C15) & 0x7FFFFFFFFFFFFFFF for k in keys]
    assert [f.contains(p) for p in probe] == [g.contains(p) for p in probe]


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1),
                min_size=2, max_size=100, unique=True))
@settings(max_examples=40, deadline=None)
def test_cuckoo_delete_restores(keys):
    f = CuckooFilter(capacity=512)
    for k in keys:
        f.add(k)
    gone = keys[0]
    assert f.delete(gone)
    for k in keys[1:]:
        assert f.contains(k)  # deleting one key never evicts another


# --------------------------------------------------------------------------
# MinHash Jaccard-estimate concentration
# --------------------------------------------------------------------------

@given(st.integers(min_value=0, max_value=9), st.integers(min_value=1, max_value=5))
@settings(max_examples=20, deadline=None)
def test_minhash_estimate_tracks_jaccard(seed_words, drift):
    from langscrape_ray.pipelines.dedup import MinHashSignatures, ngram_jaccard

    base = " ".join(f"tok{seed_words}{i}" for i in range(60))
    words = base.split()
    words[: drift * 4] = [f"other{j}" for j in range(drift * 4)]
    other = " ".join(words)

    mh = MinHashSignatures(num_perm=128)
    sa, sb = mh.signature(base), mh.signature(other)
    est = float((sa == sb).mean())
    true = ngram_jaccard(base, other)
    # 128 permutations: standard error ~= sqrt(J(1-J)/128) <= 0.045
    assert abs(est - true) < 0.2


# ---------------------------------------------------------------------------
# fast-tokenizer / parser differential property
# ---------------------------------------------------------------------------

_HTMLISH = st.lists(
    st.sampled_from(
        ['<div>', '</div>', '<p class="a">', 'text', ' & ', '&amp;', '&#65;',
         '<br/>', '<img src=x>', '<', '>', '<!-- c -->', '<!--', '-->',
         '<script>', '</script>', '<a href="/x?a=1&b=2">', '</a>',
         '&bogus;', '=', '/>', '<!doctype html>', '<?pi?>', '\n',
         '<em a=b c>', '</em >', '&amp', '"', "'", 'é', '&#x48;']
    ),
    min_size=1, max_size=10,
)


@given(_HTMLISH)
@settings(max_examples=300, deadline=None)
def test_fast_tokenizer_never_diverges(frags):
    """Property: for ANY input, the fast tokenizer either rejects (stdlib
    fallback) or builds a DOM deep-equal to the stdlib parser's."""
    from langscrape_ray.kernel.dom import Node, _fast_tokenize, _TreeBuilder
    from langscrape_ray.kernel.textops import remove_control_characters

    s = remove_control_characters("".join(frags))
    ev = _fast_tokenize(s)
    if ev is None:
        return  # fallback — stdlib behavior by definition
    fast = _TreeBuilder()
    for e in ev:
        k = e[0]
        if k == "data":
            fast.handle_data(e[1])
        elif k == "start":
            fast.handle_starttag(e[1], e[2])
        elif k == "end":
            fast.handle_endtag(e[1])
        elif k == "startend":
            fast.handle_startendtag(e[1], e[2])
        else:
            fast.handle_comment(e[1])
    ref = _TreeBuilder()
    ref.feed(s)
    ref.close()

    def deep_eq(a, b):
        if isinstance(a, Node) != isinstance(b, Node):
            return False
        if not isinstance(a, Node):
            return type(a) == type(b) and str(a) == str(b)
        if a.tag != b.tag or a.attrs != b.attrs or len(a.children) != len(b.children):
            return False
        return all(deep_eq(x, y) for x, y in zip(a.children, b.children))

    assert deep_eq(fast.root, ref.root)


# ---------------------------------------------------------------------------
# sketch invariants (pure numpy — no Ray session needed)
# ---------------------------------------------------------------------------


@given(
    st.lists(st.integers(min_value=0, max_value=2**62), min_size=0, max_size=400),
    st.integers(min_value=2, max_value=5),
)
@settings(max_examples=40, deadline=None)
def test_hll_merge_is_split_invariant(keys, n_chunks):
    """Folding any partition of the keys and max-merging the partials must
    equal folding the whole list — the property distributed merging
    relies on."""
    import numpy as np

    from langscrape_ray.pipelines.sketches import _hll_partial

    arr = np.asarray(keys, dtype=np.int64)
    whole = _hll_partial(arr, p=8)
    chunks = np.array_split(arr, n_chunks)
    merged = np.zeros_like(whole)
    for c in chunks:
        np.maximum(merged, _hll_partial(c, p=8), out=merged)
    assert np.array_equal(whole, merged)


@given(
    st.lists(st.text(alphabet="abcde", min_size=1, max_size=4),
             min_size=0, max_size=200),
    st.integers(min_value=2, max_value=4),
)
@settings(max_examples=40, deadline=None)
def test_cms_is_linear_and_one_sided(tokens, n_chunks):
    """Count-min partials sum to the whole-list sketch (linearity), and
    every point query upper-bounds the true count (one-sided error)."""
    from collections import Counter

    import numpy as np

    from langscrape_ray.pipelines.sketches import _cms_partial, _cms_query

    width = 64
    whole = _cms_partial(tokens, width)
    step = max(1, (len(tokens) + n_chunks - 1) // n_chunks)
    merged = sum(
        (_cms_partial(tokens[i : i + step], width)
         for i in range(0, len(tokens), step)),
        start=np.zeros_like(whole),
    )
    assert np.array_equal(whole, merged)
    true = Counter(tokens)
    for tok, cnt in true.items():
        assert _cms_query(whole, tok) >= cnt


# ---- round-5 additions: robots RFC matcher + CDC chunking ----


@given(
    st.lists(
        st.text(
            alphabet=string.ascii_lowercase + "/*$.-_%",
            min_size=1, max_size=12,
        ),
        max_size=6,
    ),
    st.lists(
        st.text(
            alphabet=string.ascii_lowercase + "/*$.-_%",
            min_size=1, max_size=12,
        ),
        max_size=6,
    ),
    st.text(alphabet=string.ascii_lowercase + "/.$-_%", max_size=30),
)
@settings(max_examples=200, deadline=None)
def test_robots_allowed_never_raises(disallow, allow, path):
    """allowed() must be total over arbitrary rule strings (wildcards,
    stray $, % — whatever a real robots.txt throws at the hot path)."""
    from langscrape_ray.frontier.robots import RobotsRules

    r = RobotsRules(disallow=tuple(disallow), allow=tuple(allow))
    assert r.allowed(path) in (True, False)
    # no Allow rule can ever make a path LESS allowed
    r_no_allow = RobotsRules(disallow=tuple(disallow))
    if r_no_allow.allowed(path):
        assert r.allowed(path)


@given(
    st.lists(
        st.text(alphabet=string.ascii_lowercase + "/", min_size=1,
                max_size=10).filter(lambda p: "*" not in p
                                    and not p.endswith("$")),
        max_size=5,
    ),
    st.text(alphabet=string.ascii_lowercase + "/", max_size=25),
)
@settings(max_examples=200, deadline=None)
def test_robots_plain_prefix_matches_startswith(disallow, path):
    """For wildcard-free Disallow-only rules the RFC longest-match
    evaluation must degrade to exactly the old prefix semantics the
    crawl fixtures (and the oracle-parity contract) rely on."""
    from langscrape_ray.frontier.robots import RobotsRules

    r = RobotsRules(disallow=tuple(disallow))
    old = not any(p and path.startswith(p) for p in disallow)
    assert r.allowed(path) == old


@given(st.binary(min_size=0, max_size=8000))
@settings(max_examples=100, deadline=None)
def test_cdc_invariants_random_bytes(data):
    """CDC boundary invariants over arbitrary byte strings: cuts are
    strictly increasing, end at len(data), every chunk (except possibly
    the last) respects [min, max], reconstruction is lossless, and
    chunking is deterministic."""
    from langscrape_ray.pipelines.cdc import cdc_boundaries

    cuts = cdc_boundaries(data)
    if not data:
        assert cuts == []
        return
    assert cuts[-1] == len(data)
    assert all(a < b for a, b in zip(cuts, cuts[1:]))
    prev = 0
    for i, c in enumerate(cuts):
        size = c - prev
        assert size <= 1024
        if i < len(cuts) - 1:
            assert size >= 64
        prev = c
    assert cuts == cdc_boundaries(data)

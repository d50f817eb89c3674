"""Property-based tests (hypothesis) over the pure numpy/bit kernels the
Spark operators are built on. These run WITHOUT a SparkSession — hundreds
of generated examples per property at unit-test cost — and pin the
invariants the example-based tests can't sweep:

- letterbox geometry holds for EVERY frame size, not the fixture's four;
- the raw-tensor codec round-trips exactly;
- the vectorized token-hash matrix product equals a per-token reference
  loop (the docstring claim in dedup._token_hashes, now enforced);
- the SimHash/aHash 4x16 banding recovers every pair with hamming <= 3
  (the pigeonhole argument, exhaustively fuzzed at the bit level).
"""

from __future__ import annotations

import numpy as np
from hypothesis import example, given, settings
from hypothesis import strategies as st

from uav_streamprocessor_spark.operators.dedup import (
    _MIX,
    _POLY_BASE,
    _token_hashes,
)
from uav_streamprocessor_spark.operators.pixel import (
    decode_image,
    encode_image,
    letterbox_array,
)

dims = st.integers(min_value=1, max_value=300)


@settings(max_examples=150, deadline=None)
@given(h=dims, w=dims, seed=st.integers(0, 2**31 - 1))
def test_letterbox_geometry_for_any_frame_size(h, w, seed):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = letterbox_array(img, target=640)
    assert out.shape == (640, 640, 3)
    scale = min(640 / w, 640 / h)
    new_w, new_h = int(w * scale), int(h * scale)
    pad_top, pad_left = (640 - new_h) // 2, (640 - new_w) // 2
    # content sits exactly in the computed window...
    content = out[pad_top : pad_top + new_h, pad_left : pad_left + new_w]
    assert content.shape[:2] == (new_h, new_w)
    # ...corner pixels map back to the source corners (nearest-neighbor)
    assert (content[0, 0] == img[0, 0]).all()
    # ...and everything outside it is zero padding
    mask = np.ones((640, 640), dtype=bool)
    mask[pad_top : pad_top + new_h, pad_left : pad_left + new_w] = False
    assert out[mask].sum() == 0


@settings(max_examples=100, deadline=None)
@given(h=dims, w=dims, seed=st.integers(0, 2**31 - 1))
def test_raw_tensor_codec_roundtrips_exactly(h, w, seed):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (decode_image(encode_image(img)) == img).all()


@settings(max_examples=100, deadline=None)
@given(
    tokens=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FFF),
            max_size=24,
        ),
        max_size=30,
    )
)
def test_vectorized_token_hash_equals_reference_loop(tokens):
    got = _token_hashes(tokens)
    # independent per-token reference: the unvectorized polynomial
    ref = []
    for t in tokens:
        h = np.uint64(0)
        with np.errstate(over="ignore"):
            # matrix form multiplies byte i by BASE**i (ascending), so the
            # reference accumulates the same ascending-power polynomial
            for i, byte in enumerate(t.encode("utf-8")):
                h = h + np.uint64(byte) * _POLY_BASE ** np.uint64(i)
            h = (h ^ (h >> np.uint64(33))) * _MIX
        ref.append(int(h))
    assert [int(x) for x in got] == ref


@settings(max_examples=300, deadline=None)
@given(
    base=st.integers(0, 2**64 - 1),
    flips=st.lists(st.integers(0, 63), max_size=3, unique=True),
)
def test_banding_finds_every_pair_within_hamming_3(base, flips):
    """Pigeonhole: flipping <= 3 of 64 bits leaves >= 1 of the 4 16-bit
    bands untouched — the recall-1.0 claim of SimHash/aHash banding,
    fuzzed over arbitrary signatures and flip sets."""
    other = base
    for b in flips:
        other ^= 1 << b
    shares_band = any(
        (base >> (16 * band)) & 0xFFFF == (other >> (16 * band)) & 0xFFFF
        for band in range(4)
    )
    assert shares_band


# --- streaming Welford kernel (anomaly_stream) ---

class _FakeState:
    def __init__(self):
        self.exists = False
        self.get = None

    def update(self, v):
        self.exists = True
        self.get = v


def _run_welford(chunks):
    """Drive the processor across chunk boundaries with threaded state,
    exactly as applyInPandasWithState would."""
    import pandas as pd

    from uav_streamprocessor_spark.streaming.anomaly_stream import (
        make_welford_processor,
    )

    proc = make_welford_processor()
    state = _FakeState()
    outs = []
    t = 0
    for chunk in chunks:
        pdf = pd.DataFrame(
            {
                "user_id": 1,
                "event_id": range(t, t + len(chunk)),
                "ts_us": range(t, t + len(chunk)),
                "value": chunk,
            }
        )
        t += len(chunk)
        outs.append(next(proc((1,), iter([pdf]), state)))
    # Normalize dtypes before concat: a chunk whose every z is None
    # infers an all-NA OBJECT column, and pandas 2.x deprecates letting
    # such entries steer concat dtype inference (FutureWarning, breaking
    # on the next major). The production path never sees this — Spark's
    # applyInPandasWithState converts through Arrow with the declared
    # `z double` schema — so the cast belongs to this test harness.
    non_empty = [o.astype({"z": "float64"}) for o in outs if len(o)]
    return pd.concat(non_empty or outs[:1], ignore_index=True)


@settings(max_examples=100, deadline=None)
@given(
    values=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=3,
        max_size=40,
    ),
    cut=st.integers(min_value=0, max_value=39),
)
@example(
    # r9 Hypothesis counterexample: denormal-scale prefix whose spread is
    # ~1e-9 of its magnitude — an ill-conditioned z where BOTH Welford and
    # two-pass carry relative error ~eps*kappa (see the rtol_eff branch)
    values=[1.1754943508222875e-38, 1.175494351e-38, 0.0],
    cut=0,
).via("discovered failure")
def test_welford_prequential_z_matches_two_pass_and_split_invariant(values, cut):
    cut = min(cut, len(values) - 1)
    whole = _run_welford([values])
    split = _run_welford([values[:cut], values[cut:]])
    # batch boundaries are irrelevant: identical output row-for-row
    assert whole["z"].equals(split["z"])
    # each emitted z equals the naive two-pass prefix statistics
    for i in range(len(values)):
        prior = np.array(values[:i], dtype=np.float64)
        z = whole["z"].iloc[i]
        # ptp()==0 is the EXACT constant-prefix check: the streaming
        # Welford M2 is identically 0 there (delta is 0 every step) and
        # the operator rightly emits null — but numpy's two-pass std can
        # report ~2e-16 binary-representation noise for e.g. three 1.9s,
        # so an `std == 0.0` guard takes the wrong branch (the r5
        # Hypothesis counterexample [1.9, 1.9, 1.9, 0.0]).
        if len(prior) < 2 or float(np.ptp(prior)) == 0.0:
            assert z is None or np.isnan(z)
        elif z is None or (isinstance(z, float) and np.isnan(z)):
            # operator's single-pass M2 underflowed to 0 on a prefix
            # whose true spread is at rounding-noise scale — accept
            # null ONLY when the two-pass std sits below that floor
            floor = (
                len(prior)
                * np.finfo(np.float64).eps
                * max(float(np.abs(prior).max()), 1.0)
            )
            assert float(prior.std(ddof=1)) <= floor
        else:
            std = float(prior.std(ddof=1))
            expected = (values[i] - prior.mean()) / std
            # conditioning-aware tolerance: centering loses ~eps*|mean|
            # absolutely, so the DEVIATIONS (hence std and z) carry
            # relative error ~eps*kappa where kappa = |mean|/std — for
            # well-scaled data kappa≈1 and this floors at 1e-7, but a
            # denormal-scale prefix with spread 1e-9 of its magnitude
            # (the r9 counterexample) legitimately diverges at ~1e-6 in
            # BOTH algorithms. Past kappa*eps ~ 0.1 the statistic is
            # pure rounding noise and the only meaningful invariants
            # are the split/NaN ones already asserted above.
            eps = float(np.finfo(np.float64).eps)
            kappa = abs(float(prior.mean())) / std if std > 0.0 else np.inf
            rtol_eff = max(1e-7, 8.0 * len(prior) * eps * kappa)
            if rtol_eff < 0.1:
                assert np.isclose(z, expected, rtol=rtol_eff, atol=1e-9)


# ---------------------------------------------------------------------------
# round-7 kernels: space-saving summary + chunk-manifest arithmetic
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    xs=st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=300),
    capacity=st.integers(min_value=1, max_value=8),
    cut=st.integers(min_value=0, max_value=300),
)
def test_space_saving_bounds_and_split_invariance(xs, capacity, cut):
    """For EVERY stream and capacity: est−err ≤ true ≤ est for all
    tracked items, any item with freq > n/capacity is tracked, and
    feeding the stream in two chunks through carried state equals the
    one-shot pass (the micro-batch boundary invariance the Spark tests
    check on one corpus, swept here over hundreds)."""
    import pandas as pd

    from collections import Counter

    from uav_streamprocessor_spark.streaming.topk_stream import (
        make_topk_processor,
    )

    class _State:
        def __init__(self):
            self.exists = False
            self.get = None

        def update(self, v):
            self.exists = True
            self.get = v

    def pdf(seq, start):
        return pd.DataFrame(
            {
                "user_id": seq,
                "event_id": range(start, start + len(seq)),
                "ts_us": range(start, start + len(seq)),
            }
        )

    proc = make_topk_processor(capacity)
    one = _State()
    out_one = next(proc(("t",), iter([pdf(xs, 0)]), one))

    cut = min(cut, len(xs))
    split = _State()
    proc2 = make_topk_processor(capacity)
    if cut:
        next(proc2(("t",), iter([pdf(xs[:cut], 0)]), split))
    if cut < len(xs) or not cut:
        out_split = next(proc2(("t",), iter([pdf(xs[cut:], cut)]), split))
    else:
        out_split = out_one if cut == len(xs) and not xs[cut:] else out_one
    if xs[cut:]:
        rows_one = list(
            zip(out_one["user_id"], out_one["est_count"], out_one["error"])
        )
        rows_split = list(
            zip(out_split["user_id"], out_split["est_count"], out_split["error"])
        )
        assert rows_one == rows_split

    truth = Counter(xs)
    n = len(xs)
    tracked = dict(zip(out_one["user_id"], zip(out_one["est_count"], out_one["error"])))
    for item, (est, err) in tracked.items():
        assert est - err <= truth[item] <= est
    for item, freq in truth.items():
        if freq > n / capacity:
            assert item in tracked, (item, freq, n, capacity)


@settings(max_examples=300, deadline=None)
@given(
    n_tokens=st.integers(min_value=1, max_value=5000),
    chunk=st.integers(min_value=2, max_value=256),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
def test_chunk_manifest_arithmetic_covers_every_token(n_tokens, chunk, overlap_frac):
    """The chunk-count/offset arithmetic registered in
    text_chunk_manifest, swept over every (doc length, chunk size,
    overlap): chunks start at 0, end at n_tokens, overlap by exactly
    `overlap` internally, and cover every token with no gaps."""
    import math

    overlap = min(int(chunk * overlap_frac), chunk - 1)
    stride = chunk - overlap
    n_chunks = max(1, math.ceil((n_tokens - overlap) / stride))
    spans = []
    for c in range(n_chunks):
        start = c * stride
        end = min(start + chunk, n_tokens)
        spans.append((start, end))
        assert end > start  # never an empty chunk
    assert spans[0][0] == 0
    assert spans[-1][1] == n_tokens
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert s2 <= e1  # no gaps (adjacent when overlap == 0)
        if overlap:
            assert s2 < e1  # genuine overlap when requested
        assert s2 == s1 + stride


# ---------------------------------------------------------------------------
# winnowing (dedup_winnowing) — fuzzed guarantee on a pure-python mirror
# ---------------------------------------------------------------------------

import hashlib


def winnow_reference(text: str, k: int = 8, w: int = 4) -> set[str]:
    """Pure-python mirror of the SQL winnowing selection in
    dedup.winnowing_fingerprints: lowercase, md5-hex[:12] char-k-gram
    hashes, per-window minima over all FULL windows, distinct. Kept
    semantically identical so test_round7b_ops can pin the Spark op
    against it row-for-row on the real corpus."""
    t = text.lower()
    n = len(t)
    if n < k + w - 1:
        return set()
    hashes = [
        hashlib.md5(t[p : p + k].encode("utf-8")).hexdigest()[:12]
        for p in range(n - k + 1)
    ]
    return {min(hashes[q : q + w]) for q in range(len(hashes) - w + 1)}


_filler = st.text(
    alphabet=st.characters(min_codepoint=97, max_codepoint=122),
    min_size=0,
    max_size=40,
)


@settings(max_examples=200, deadline=None)
@given(
    shared=st.text(
        alphabet=st.characters(min_codepoint=97, max_codepoint=122),
        min_size=11,  # k + w - 1 at k=8, w=4
        max_size=30,
    ),
    a_pre=_filler, a_post=_filler, b_pre=_filler, b_post=_filler,
)
def test_winnowing_guarantee_fuzzed(shared, a_pre, a_post, b_pre, b_post):
    """Schleimer/Wilkerson/Aiken guarantee, fuzzed: ANY two docs sharing
    a substring of length >= k + w − 1 share at least one fingerprint —
    whatever surrounds it. (The lesson from the r5 edit-distance
    band-boundary bug: blocking-scheme recall claims need adversarial
    sweeps, not just one planted example.) The proof obligation is that
    some full window of k-grams lies wholly inside the shared substring
    and its minimum is selected in both documents."""
    doc_a = a_pre + shared + a_post
    doc_b = b_pre + shared + b_post
    fp_a = winnow_reference(doc_a)
    fp_b = winnow_reference(doc_b)
    assert fp_a & fp_b, (doc_a, doc_b)


@settings(max_examples=100, deadline=None)
@given(
    doc=st.text(
        alphabet=st.characters(min_codepoint=97, max_codepoint=122),
        min_size=11,
        max_size=200,
    )
)
def test_winnowing_density_and_bounds_fuzzed(doc):
    """Selected fingerprints are a subset of the doc's k-gram hashes,
    non-empty once a full window exists, and never exceed the window
    count (each window selects exactly one)."""
    fps = winnow_reference(doc)
    n_windows = len(doc) - 8 + 1 - 3
    assert 0 < len(fps) <= n_windows
    all_hashes = {
        hashlib.md5(doc.lower()[p : p + 8].encode()).hexdigest()[:12]
        for p in range(len(doc) - 8 + 1)
    }
    assert fps <= all_hashes


# ---------------------------------------------------------------------------
# count-min sketch hash twins (streaming/cms_stream.py)
# ---------------------------------------------------------------------------

from uav_streamprocessor_spark.streaming.cms_stream import (  # noqa: E402
    _bucket_indices,
    cms_rows,
)


@settings(max_examples=200, deadline=None)
@given(
    uids=st.lists(
        st.integers(min_value=0, max_value=2**62 - 1), min_size=1, max_size=50
    ),
    width=st.sampled_from([16, 64, 256, 1024]),
)
def test_cms_python_and_numpy_hash_twins_agree_everywhere(uids, width):
    """The pure-python cms_rows (used by tests to verify collision-
    freeness) and the vectorized _bucket_indices (used by the store)
    must agree on every row for ANY id up to 2^62 and any width —
    uint64 wraparound vs python-int masking is exactly the seam where
    they could drift."""
    arr = np.array(uids, dtype=np.int64)
    for i in range(4):
        vec = list(_bucket_indices(arr, i, width))
        ref = [cms_rows(u, width=width)[i] for u in uids]
        assert vec == ref


@settings(max_examples=100, deadline=None)
@given(uid=st.integers(min_value=0, max_value=2**62 - 1))
def test_cms_rows_decorrelated_across_hash_rows(uid):
    """Regression for the launch bug: ids congruent mod width collided
    in ALL rows under the affine-only family. An id and its +width
    neighbor must now differ in at least one of the four rows (the
    xor-shift finalizer mixes high bits into the bucket index)."""
    a = cms_rows(uid, width=256)
    b = cms_rows(uid + 256, width=256)
    assert a != b


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 16) - 1),
            st.integers(min_value=0, max_value=(1 << 16) - 1),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=50, deadline=None)
def test_morton_interleave_bijective_and_oracle_equal(pairs):
    """rel_zorder_layout's Morton key: (a) the interleave is a bijection
    (deinterleave recovers both coordinates exactly — a key collision
    would silently merge file cells), and (b) the generated DuckDB
    disjoint-powers sum equals the bit-level reference for arbitrary
    16-bit inputs (the oracle half of the Spark/oracle parity proof)."""
    import duckdb

    def interleave(a, b, bits=16):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    def deinterleave(z, bits=16):
        a = b = 0
        for i in range(bits):
            a |= ((z >> (2 * i + 1)) & 1) << i
            b |= ((z >> (2 * i)) & 1) << i
        return a, b

    morton_sql = " + ".join(
        f"(((a >> {i}) & 1) * {1 << (2 * i + 1)}) + "
        f"(((b >> {i}) & 1) * {1 << (2 * i)})"
        for i in range(16)
    )
    con = duckdb.connect()
    for a, b in pairs:
        z = interleave(a, b)
        assert deinterleave(z) == (a, b)
        got = con.sql(
            f"SELECT {morton_sql} FROM (SELECT {a}::BIGINT AS a, {b}::BIGINT AS b)"
        ).fetchone()[0]
        assert got == z


# -- AVI container arithmetic (sources/avi.py) --------------------------------
#
# The codec-free demux/mux pair is pure byte arithmetic; fuzz the
# invariants the fixture tests can't sweep: EVERY frame size round-trips
# pixel-exactly (odd widths exercise the 4-byte DIB stride pad), EVERY
# payload size round-trips through chunk even-padding, and the no-idx1
# linear movi scan rebuilds the identical offset index.


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    n=st.integers(1, 6),
    seed=st.integers(0, 2**31 - 1),
    with_idx1=st.booleans(),
)
def test_avi_dib_round_trip_any_geometry(tmp_path_factory, h, w, n, seed, with_idx1):
    from uav_streamprocessor_spark.sources.avi import AviFile, write_avi

    tmp = tmp_path_factory.mktemp("avi")
    rng = np.random.RandomState(seed)
    frames = [rng.randint(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]
    p = write_avi(str(tmp / "f.avi"), frames, fps=24.0, with_idx1=with_idx1)
    av = AviFile(p)
    assert av.n_frames == n and (av.width, av.height) == (w, h)
    for i, f in enumerate(frames):
        assert (av.frame_array(i) == f).all()


@settings(max_examples=60, deadline=None)
@given(
    sizes=st.lists(st.integers(0, 200), min_size=1, max_size=8),
    seed=st.integers(0, 2**31 - 1),
    with_idx1=st.booleans(),
)
def test_avi_opaque_payload_round_trip_any_sizes(
    tmp_path_factory, sizes, seed, with_idx1
):
    """Odd payload sizes force the RIFF even-pad byte on write; the
    demuxer's index (idx1 or linear scan) must still return payloads
    verbatim."""
    from uav_streamprocessor_spark.sources.avi import (
        FOURCC_MJPG,
        AviFile,
        write_avi,
    )

    tmp = tmp_path_factory.mktemp("avi")
    rng = np.random.RandomState(seed)
    payloads = [rng.bytes(s) for s in sizes]
    p = write_avi(
        str(tmp / "f.avi"), payloads, fps=30.0, fourcc=FOURCC_MJPG,
        width=16, height=9, with_idx1=with_idx1,
    )
    av = AviFile(p)
    assert av.fourcc == FOURCC_MJPG
    assert [av.frame_bytes(i) for i in range(av.n_frames)] == payloads


# -- baseline JPEG codec (operators/jpeg.py) ----------------------------------


@settings(max_examples=50, deadline=None)
@given(
    h=st.integers(1, 33),
    w=st.integers(1, 33),
    q=st.integers(40, 100),
    sub=st.sampled_from(["4:4:4", "4:2:2", "4:2:0"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_round_trip_any_geometry(h, w, q, sub, seed):
    """Every (geometry, quality, subsampling) encodes to a parseable
    baseline scan and decodes back to the exact shape; flat fields are
    bit-exact, and even adversarial noise stays within the coarsest
    possible quantization error bound."""
    from uav_streamprocessor_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
    assert out.shape == (h, w, 3) and out.dtype == np.uint8
    assert abs(float(out.mean()) - float(img.mean())) < 96.0

    flat = np.full((h, w, 3), 128, np.uint8)
    assert (decode_jpeg(encode_jpeg(flat, quality=q, subsampling=sub)) == flat).all()

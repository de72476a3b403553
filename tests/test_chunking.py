"""Long-form chunking + LCS merge tests (reference wis/audio.py:106-159)."""

import numpy as np

from wis_tpu.audio import chunk_iter, find_longest_common_sequence
from wis_tpu.audio.chunking import (
    CHUNK_LEN,
    STRIDE_LEFT,
    STRIDE_RIGHT,
    num_chunks,
)
from wis_tpu.audio.mel import SAMPLE_RATE


def test_chunk_iter_short_single_chunk():
    audio = np.zeros(10 * SAMPLE_RATE, dtype=np.float32)
    chunks = list(chunk_iter(audio))
    assert len(chunks) == 1
    chunk, (n, left, right) = chunks[0]
    assert n == audio.shape[0] and left == 0 and right == 0


def test_chunk_iter_strides_and_coverage():
    audio = np.arange(60 * SAMPLE_RATE, dtype=np.float32)
    chunks = list(chunk_iter(audio))
    assert len(chunks) == num_chunks(audio.shape[0])
    # first chunk: no left stride; last: no right stride
    assert chunks[0][1][1] == 0
    assert chunks[-1][1][2] == 0
    for chunk, (n, left, right) in chunks[1:-1]:
        assert n == CHUNK_LEN and left == STRIDE_LEFT and right == STRIDE_RIGHT
    # effective (stride-trimmed) regions tile the signal without gaps
    step = CHUNK_LEN - STRIDE_LEFT - STRIDE_RIGHT
    starts = [i * step for i in range(len(chunks))]
    for (chunk, _), start in zip(chunks, starts):
        assert chunk[0] == audio[start]


def test_lcs_merge_overlap():
    specials = frozenset({50258, 50259, 50359, 50363, 50257})
    a = [50258, 50259, 1, 2, 3, 4, 5, 6, 50257]
    b = [50258, 4, 5, 6, 7, 8, 9, 50257]
    merged = find_longest_common_sequence(
        [(a, (100, 0, 10)), (b, (100, 10, 0))], specials
    )
    np.testing.assert_array_equal(merged, [1, 2, 3, 4, 5, 6, 7, 8, 9])


def test_lcs_merge_no_overlap_concatenates():
    specials = frozenset()
    a = [1, 2, 3]
    b = [7, 8, 9]
    merged = find_longest_common_sequence([(a, (1, 0, 0)), (b, (1, 0, 0))], specials)
    np.testing.assert_array_equal(merged, [1, 2, 3, 7, 8, 9])


def test_lcs_merge_first_chunk_shorter_than_second():
    """A near-empty first chunk must not crash the merge (the reference's
    HF-derived implementation raises a numpy broadcast ValueError when a
    chunk yields more tokens than the whole merge so far)."""
    specials = frozenset({50257})
    a = [9, 50257]  # one real token
    b = [9, 1, 2, 3, 4, 5, 6, 7, 8, 50257]
    merged = find_longest_common_sequence([(a, (1, 0, 0)), (b, (1, 0, 0))], specials)
    # single-token overlaps never align (matches > 1 guard) — concatenate
    np.testing.assert_array_equal(merged, [9, 9, 1, 2, 3, 4, 5, 6, 7, 8])


def test_lcs_merge_empty_first_chunk():
    specials = frozenset({50257})
    merged = find_longest_common_sequence(
        [([50257], (1, 0, 0)), ([1, 2, 3, 50257], (1, 0, 0))], specials
    )
    np.testing.assert_array_equal(merged, [1, 2, 3])

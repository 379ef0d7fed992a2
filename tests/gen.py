"""Synthetic FASTQ corpus generation for tests and benchmarks."""

import numpy as np

ALPHABET = b"ACGT"


def make_records(
    n: int,
    min_len: int = 60,
    max_len: int = 60,
    seed: int = 0,
    n_prob: float = 0.0,
    phred: int = 33,
    min_q: int = 2,
    max_q: int = 41,
    lowercase_prob: float = 0.0,
    qual_bins=None,
):
    """Generate n (name, seq, qual) tuples with reproducible randomness.

    ``qual_bins``: draw qualities from this value set instead of the
    uniform [min_q, max_q] range — e.g. ``(2, 12, 23, 37)`` reproduces
    NovaSeq/NextSeq RTA3 4-level quality binning, the dominant shape of
    modern production FASTQ."""
    rng = np.random.default_rng(seed)
    lens = rng.integers(min_len, max_len + 1, size=n)
    out = []
    for i in range(n):
        ln = int(lens[i])
        bases = rng.integers(0, 4, size=ln)
        seq = np.frombuffer(ALPHABET, dtype=np.uint8)[bases].copy()
        if n_prob > 0:
            seq[rng.random(ln) < n_prob] = ord("N")
        if lowercase_prob > 0:
            lower = rng.random(ln) < lowercase_prob
            seq[lower] = seq[lower] + 32
        if qual_bins is not None:
            bins = np.asarray(qual_bins, dtype=np.int64)
            q = bins[rng.integers(0, len(bins), size=ln)] + phred
        else:
            q = rng.integers(min_q, max_q + 1, size=ln) + phred
        out.append(
            (b"@read_%d some description" % i, seq.tobytes(), q.astype(np.uint8).tobytes())
        )
    return out


def write_fastq(path, records, gz: bool = False):
    import gzip

    op = gzip.open if gz else open
    with op(path, "wb") as f:
        for name, seq, qual in records:
            f.write(name + b"\n" + seq + b"\n+\n" + qual + b"\n")
    return path


def make_fastq(path, n: int, **kw):
    gz = str(path).endswith(".gz")
    records = make_records(n, **kw)
    write_fastq(path, records, gz=gz)
    return records

"""Chaos-game oracle: faithful re-implementation of the legacy CGR loop.

Per-byte port of the reference semantics (``old/chaos_game.c:165-267``):
the f64 iterated-function-system recurrence

    A: x <- x + (dim-x)/2, y <- y/2      C: x <- x/2, y <- y/2
    G: x <- x/2, y <- y + (dim-y)/2      T: both <- . + (dim-.)/2

with per-read word-counter reset (but coordinates carrying across reads,
``old/chaos_game.c:196-260``), N resetting the word and its quality
accumulator (``:229-233``), the EPSILON boundary clamp (``:243-251``), and
the sliding-window oldest-quality subtraction (``:259``).

Case handling: this oracle (and the kernel) consume the packer's
case-folded codes, so lowercase a/c/g/t advance the word and lowercase n
resets it — a DELIBERATE DEVIATION from the reference loop, whose switch
matches only uppercase bytes (``old/chaos_game.c:199-234``) and lets
lowercase fall through with no effect (soft-masked bases are real bases;
silently skipping them mid-word would splice artificial k-words together).

Non-ACGTN bytes (packer code 5): this loop replicates the reference's
fall-through faithfully — the byte is skipped, a k-word can splice across
it, and the sliding-window subtraction then reads the wrong (original-
position) quality byte.  The production kernel deliberately deviates:
it treats such bytes like N (deviation [D7], ``hpgq/kernels/cgr.py``), so
kernel(batch) == this_loop(batch with 5 -> N).

This loop is the equivalence witness for the vectorized closed form in
``hpgq.kernels.cgr`` (see that module for the proof sketch) and is used by
tests only — the pipelines run the kernel.
"""

from __future__ import annotations

import numpy as np

from ..constants import (
    BASE_A,
    BASE_C,
    BASE_G,
    BASE_N,
    BASE_T,
    CGR_EPSILON,
)


def fill_tables_loop(codes, quals, lens, valid, k: int, phred: int,
                     f0: float = None):
    """(table_seq, table_q, fq_word_count) over packed [B, L] batches.

    ``codes``/``quals``/``lens``/``valid``: the engine's packed layout.
    ``f0``: initial coordinate (reference: dim/2, old/chaos_game.c:106-107).
    """
    dim = 1 << k
    table_seq = np.zeros((dim, dim), dtype=np.int64)
    table_q = np.zeros((dim, dim), dtype=np.int64)
    f_x = float(dim) * 0.5 if f0 is None else f0
    f_y = f_x
    sub = phred * k
    word_count = 0

    B, L = codes.shape
    for i in range(B):
        if not valid[i]:
            continue
        nt_word_count = 0
        acc_q = 0
        ln = int(lens[i])
        for j in range(ln):
            c = int(codes[i, j])
            q = int(quals[i, j])
            if c == BASE_A:
                f_x = f_x + (dim - f_x) * 0.5
                f_y = f_y * 0.5
            elif c == BASE_C:
                f_x = f_x * 0.5
                f_y = f_y * 0.5
            elif c == BASE_G:
                f_x = f_x * 0.5
                f_y = f_y + (dim - f_y) * 0.5
            elif c == BASE_T:
                f_x = f_x + (dim - f_x) * 0.5
                f_y = f_y + (dim - f_y) * 0.5
            elif c == BASE_N:
                nt_word_count = 0
                acc_q = 0
                continue
            else:
                # reference: non-ACGTN bytes fall through the switch with no
                # counter change (old/chaos_game.c:199-234 has no default)
                continue
            nt_word_count += 1
            acc_q += q

            if nt_word_count == k:
                co_x = int(f_x)
                co_y = int(f_y)
                if co_x == dim:
                    co_x = dim - 1
                    f_x -= CGR_EPSILON
                if co_y == dim:
                    co_y = dim - 1
                    f_y -= CGR_EPSILON
                table_seq[co_x, co_y] += 1
                word_count += 1
                nt_word_count -= 1
                table_q[co_x, co_y] += acc_q - sub
                acc_q -= int(quals[i, j - k + 1])
    return table_seq, table_q, word_count

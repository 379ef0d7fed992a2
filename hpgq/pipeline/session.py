"""Engine session: shape management + jit caching for the streaming pipeline.

The streaming loop feeds fixed-shape ``[B, Lbucket]`` batches to jitted device
functions (XLA requires static shapes): read lengths are bucketed to
multiples of 128 lanes, the read dimension is padded to the configured batch
size, and a grown length bucket transparently rebuilds the device accumulator
(host counters carry over — merging is associative).
"""

from __future__ import annotations

import numpy as np
import jax

from ..core.accumulator import DeviceAccumulator
from ..io.packer import pack_block, round_up


class StatsSession:
    """Streaming stats accumulation with automatic length growth."""

    def __init__(self, phred, kmers_on=False, crit=None, batch_reads=16384,
                 device=None, lcap: int = 128, engine=None):
        self.phred = phred
        self.kmers_on = kmers_on
        self.crit = crit
        self.batch_reads = batch_reads
        self.device = device
        self.engine = engine
        self.acc = DeviceAccumulator(
            lcap, phred, kmers_on, crit, batch_reads=batch_reads, device=device,
            engine=engine,
        )

    @property
    def lcap(self):
        return self.acc.lcap

    def _grow(self, lcap: int):
        if lcap * self.batch_reads > (1 << 28):  # ~0.33 GB of wire bytes
            import logging

            logging.getLogger("hpgq").warning(
                "long reads: device batch is %d rows x %d nt (~%.1f GB "
                "packed) — lower --batch-size / --device-batch-reads to "
                "bound device memory",
                self.batch_reads, lcap,
                self.batch_reads * lcap * 1.25 / 1e9,
            )
        old = self.acc.finish()
        self.acc = DeviceAccumulator(
            lcap, self.phred, self.kmers_on, self.crit,
            batch_reads=self.batch_reads, device=self.device,
            engine=self.engine,
        )
        self.acc.counters = old
        old.ensure_length(lcap)

    def feed_block(self, block, timers=None, sel=None):
        """Feed a RecordBlock; ``sel`` (bool [num_reads]) restricts which
        reads count (the paired pair-consistent filter).  Uses the native
        single-pass wire packer when a wire format is active — the selection
        is applied by zeroing the per-row valid byte in the wire buffer
        (one scatter) instead of re-packing."""
        lmax = round_up(max(block.max_len(), 1), 128)
        if lmax > self.lcap:
            self._grow(lmax)
        wire = self.acc.wire
        if wire in ("bitpack", "fused4"):
            from ..io.packer import pack_block_wire

            buf = pack_block_wire(block, wire, self.lcap,
                                  pad_reads_to=self.batch_reads)
            if sel is not None:
                drop = np.flatnonzero(~np.asarray(sel, bool))
                if drop.size:
                    buf[drop, buf.shape[1] - 4] = 0  # tail valid byte
            self.acc.update(buf)
            return
        codes, quals, lens, valid = pack_block(
            block, max_len=self.lcap, pad_reads_to=self.batch_reads
        )
        if sel is not None:
            valid = valid.copy()
            valid[: len(sel)] &= np.asarray(sel, bool)
        self.feed_packed(codes, quals, lens, valid)

    def feed_packed(self, codes, quals=None, lens=None, valid=None):
        # quals carry the logical L; a lone wire buffer encodes L in its
        # row width (fused4: W = L/2 + L + 8; bitpack: W = 10L/8 + 8)
        if quals is None:
            from ..kernels.stats_jnp import bitwire_logical_len, fused_logical_len

            L = (bitwire_logical_len if self.acc.wire == "bitpack"
                 else fused_logical_len)(codes.shape[1])
        else:
            L = quals.shape[1]
        if L > self.lcap:
            self._grow(L)
        self.acc.update(codes, quals, lens, valid)

    def finish(self):
        return self.acc.finish()


_FN_CACHE = {}  # global so compiled fns survive across pipeline runs


class ShapeCachedFn:
    """jit wrapper dispatching on padded batch shapes (one compile per bucket).

    ``cache_key`` (when hashable and non-None) keys a process-global compile
    cache, so repeated runs with identical static config reuse the jitted
    executable instead of recompiling (jax.jit caches per function object).

    When a wire format is active (bitpack/fused4 — TPU default), the block
    is packed host-side into the single wire buffer and decoded on device,
    so filter/edit/paired-stats verdict+trim calls ship the same minimal
    bytes per read as the stats engine (H2D is the pipeline ceiling on
    tunneled/remote links — see bench.py's breakdown)."""

    def __init__(self, build_fn, batch_reads: int, cache_key=None):
        self._build = build_fn
        self._cache = {}
        self._key = cache_key
        self.batch_reads = batch_reads

    def _fn_for(self, shape, wire, wrap):
        if self._key is not None:
            key = (self._key, wire, shape)
            fn = _FN_CACHE.get(key)
            if fn is None:
                fn = _FN_CACHE[key] = jax.jit(wrap(self._build()))
            return fn
        key = (wire, shape)
        fn = self._cache.get(key)
        if fn is None:
            fn = self._cache[key] = jax.jit(wrap(self._build()))
        return fn

    def __call__(self, block):
        from ..core.accumulator import resolve_wire

        lmax = round_up(max(block.max_len(), 1), 128)
        n = block.num_reads
        wire = resolve_wire()
        if wire in ("bitpack", "fused4"):
            from ..io.packer import pack_block_wire
            from ..kernels.stats_jnp import wire_unbits, wire_unfuse

            buf = pack_block_wire(block, wire, lmax,
                                  pad_reads_to=self.batch_reads)
            unf = wire_unbits if wire == "bitpack" else wire_unfuse
            wrap = lambda inner: (lambda b: inner(*unf(b)))  # noqa: E731
            out = self._fn_for(buf.shape, wire, wrap)(buf)
        else:
            codes, quals, lens, valid = pack_block(
                block, max_len=lmax, pad_reads_to=self.batch_reads
            )
            out = self._fn_for(codes.shape, None, lambda f: f)(
                codes, quals, lens, valid
            )
        return jax.tree_util.tree_map(lambda x: np.asarray(x)[:n], out)

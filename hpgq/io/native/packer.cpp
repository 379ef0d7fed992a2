// hpgq native packer: FASTQ record indexing + padded-tensor packing.
//
// TPU-native replacement for the reference's native FASTQ parser layer
// (fastq_fread_se / fastq_read_t, call sites src/stats_fastq.c:183,353-360):
// instead of one heap object per read, one pass over a byte chunk yields
// line-offset tables, and a second OpenMP-parallel pass translates bases
// through a LUT into the engine's packed [N, L] int8/uint8 layout.
// Exposed as a plain C ABI for ctypes (no pybind11 in this toolchain).
//
// Build: see hpgq/io/native/__init__.py (g++ -O3 -fopenmp -shared).

#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Scan `buf[0..n)` for newline positions, recording up to `max_lines` of
// them into `nl`.  Returns the number recorded.  (memchr-based: glibc's
// AVX2 memchr is ~an order of magnitude faster than a numpy == scan.)
int64_t hpgq_find_newlines(const uint8_t* buf, int64_t n, int64_t* nl,
                           int64_t max_lines) {
    int64_t cnt = 0;
    const uint8_t* p = buf;
    const uint8_t* end = buf + n;
    while (cnt < max_lines) {
        const uint8_t* hit =
            static_cast<const uint8_t*>(memchr(p, '\n', end - p));
        if (!hit) break;
        nl[cnt++] = hit - buf;
        p = hit + 1;
    }
    return cnt;
}

// Pack `n` reads into codes[n*lmax] (int8 base codes, pad=5) and
// quals[n*lmax] (raw ASCII, pad=0).  seq_starts/q_starts/lens are per-read
// byte offsets into `buf` and sequence lengths.  `lut` is the 256-entry
// base-code table (A/a=0 C/c=1 G/g=2 T/t=3 N/n=4 other=5,
// old/chaos_game.c:51-72 semantics).
void hpgq_pack(const uint8_t* buf, const int64_t* seq_starts,
               const int64_t* q_starts, const int32_t* lens, int64_t n,
               int64_t lmax, const int8_t* lut, int8_t* codes,
               uint8_t* quals, int num_threads) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static) num_threads(num_threads)
#endif
    for (int64_t i = 0; i < n; ++i) {
        int8_t* crow = codes + i * lmax;
        uint8_t* qrow = quals + i * lmax;
        int64_t len = lens[i];
        if (len > lmax) len = lmax;
        const uint8_t* seq = buf + seq_starts[i];
        for (int64_t j = 0; j < len; ++j) crow[j] = lut[seq[j]];
        if (len < lmax) memset(crow + len, 5, lmax - len);
        memcpy(qrow, buf + q_starts[i], len);
        if (len < lmax) memset(qrow + len, 0, lmax - len);
    }
}

// Fused indexer: given newline offsets `nl` (4 per record), fill the
// [nrec, 4] line start/end tables the RecordBlock layout wants.
void hpgq_line_table(const int64_t* nl, int64_t nrec, int64_t* starts,
                     int64_t* ends) {
    int64_t prev = -1;
    for (int64_t i = 0; i < nrec * 4; ++i) {
        starts[i] = prev + 1;
        ends[i] = nl[i];
        prev = nl[i];
    }
}

// Multi-threaded newline scan: segments of `buf` are counted and filled in
// parallel (memchr per segment), results written contiguously via a prefix
// sum over per-segment counts.  Returns the total number of newlines, or
// the NEGATED total (with nothing written) when it exceeds `cap` — the
// caller then re-invokes with an exact-size buffer.
int64_t hpgq_find_newlines_mt(const uint8_t* buf, int64_t n, int64_t* nl,
                              int64_t cap, int num_threads) {
    if (num_threads < 1) num_threads = 1;
    const int64_t min_seg = 1 << 20;  // threading pays off past ~1 MB
    int nseg = (int)((n + min_seg - 1) / min_seg);
    if (nseg > num_threads) nseg = num_threads;
    if (nseg < 1) nseg = 1;
    std::vector<int64_t> counts((size_t)nseg, 0);
    std::vector<int64_t> seg_lo((size_t)nseg), seg_hi((size_t)nseg);
    for (int s = 0; s < nseg; ++s) {
        seg_lo[s] = n * s / nseg;
        seg_hi[s] = n * (s + 1) / nseg;
    }
#ifdef _OPENMP
#pragma omp parallel for schedule(static) num_threads(nseg)
#endif
    for (int s = 0; s < nseg; ++s) {
        int64_t c = 0;
        const uint8_t* p = buf + seg_lo[s];
        const uint8_t* end = buf + seg_hi[s];
        while (p < end) {
            const uint8_t* hit =
                static_cast<const uint8_t*>(memchr(p, '\n', end - p));
            if (!hit) break;
            ++c;
            p = hit + 1;
        }
        counts[(size_t)s] = c;
    }
    std::vector<int64_t> offs((size_t)nseg + 1, 0);
    for (int s = 0; s < nseg; ++s) offs[(size_t)s + 1] = offs[(size_t)s] + counts[(size_t)s];
    if (offs[(size_t)nseg] > cap) return -offs[(size_t)nseg];
#ifdef _OPENMP
#pragma omp parallel for schedule(static) num_threads(nseg)
#endif
    for (int s = 0; s < nseg; ++s) {
        int64_t* out = nl + offs[(size_t)s];
        const uint8_t* p = buf + seg_lo[s];
        const uint8_t* end = buf + seg_hi[s];
        while (p < end) {
            const uint8_t* hit =
                static_cast<const uint8_t*>(memchr(p, '\n', end - p));
            if (!hit) break;
            *out++ = hit - buf;
            p = hit + 1;
        }
    }
    return offs[(size_t)nseg];
}

// Concatenate byte spans buf[starts[i]:ends[i]) into out.  Returns total
// bytes written.  The filter/edit writers express whole records (and
// trimmed record pieces) as span lists over the original chunk buffer, so
// output assembly is n memcpys instead of per-record Python string work.
int64_t hpgq_concat_spans(const uint8_t* buf, const int64_t* starts,
                          const int64_t* ends, int64_t n, uint8_t* out) {
    int64_t total = 0;
    for (int64_t i = 0; i < n; ++i) {
        int64_t len = ends[i] - starts[i];
        if (len <= 0) continue;
        memcpy(out + total, buf + starts[i], len);
        total += len;
    }
    return total;
}

int hpgq_abi_version(void) { return 2; }

}  // extern "C"

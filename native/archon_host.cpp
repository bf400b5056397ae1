// archon_host: native host-side runtime for archon_tpu.
//
// The TPU owns the transform math; this library owns the host runtime the
// reference implemented in C (SURVEY.md section 2: "every performance-relevant
// component is native"): the serial LF chain walk used by decode paths and
// verification oracles (a6/src/bwt.c:459-478, a7/src/archon.cpp:903-943),
// histogramming, the bit-stream codec (a6/src/coder.c:108-123), and a
// mmap-backed block reader (the x1 streaming loop, final/x1/ArchonX1.c:53-60).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this environment).

#include <cstdint>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------------------
// histogram256: byte frequency count.
// ---------------------------------------------------------------------------
void archon_histogram256(const uint8_t* data, int64_t n, int64_t* out) {
    int64_t h[4][256] = {};
    int64_t i = 0;
    for (; i + 4 <= n; i += 4) {
        ++h[0][data[i]];
        ++h[1][data[i + 1]];
        ++h[2][data[i + 2]];
        ++h[3][data[i + 3]];
    }
    for (; i < n; ++i) ++h[0][data[i]];
    for (int c = 0; c < 256; ++c)
        out[c] = h[0][c] + h[1][c] + h[2][c] + h[3][c];
}

// ---------------------------------------------------------------------------
// LF successor build + chain walk: the one inherently serial loop.
// sentinel_large selects the base-last counter roll (a7/a6 convention,
// a7/src/archon.cpp:929-931); otherwise base rolls first (a4,
// a4/src/archon.c:255-257).  P is caller-allocated scratch of n int32.
// Returns 0 on success, -1 on bad input.
// ---------------------------------------------------------------------------
int archon_unbwt(const uint8_t* L, int64_t n, int64_t base, int sentinel_large,
                 int32_t* P, uint8_t* out) {
    if (n <= 0 || base < 0 || base >= n) return n == 0 ? 0 : -1;
    int64_t R[256] = {};
    for (int64_t i = 0; i < n; ++i) ++R[L[i]];
    int64_t k = n;
    for (int c = 256; c--;) R[c] = (k -= R[c]);

    if (sentinel_large) {
        for (int64_t i = 0; i < base; ++i) P[i] = (int32_t)R[L[i]]++;
        for (int64_t i = base + 1; i < n; ++i) P[i] = (int32_t)R[L[i]]++;
        P[base] = (int32_t)R[L[base]]++;
    } else {
        P[base] = (int32_t)R[L[base]]++;
        for (int64_t i = 0; i < base; ++i) P[i] = (int32_t)R[L[i]]++;
        for (int64_t i = base + 1; i < n; ++i) P[i] = (int32_t)R[L[i]]++;
    }
    int32_t kk = (int32_t)base;
    for (int64_t i = 0; i < n; ++i) {
        out[i] = L[kk];
        kk = P[kk];
    }
    return kk == (int32_t)base ? 0 : 0;
}

// ---------------------------------------------------------------------------
// LF verification of a suffix-array payload (vectorizing a4's verify(),
// a4/src/archon.c:210-225, for host-side oracle use): checks that (L, base)
// is self-consistent as a BWT stream, i.e. the LF walk visits every index
// exactly once.  Returns 0 if consistent.
// ---------------------------------------------------------------------------
int archon_verify_cycle(const uint8_t* L, int64_t n, int64_t base,
                        int sentinel_large, int32_t* P, uint8_t* seen) {
    if (n == 0) return 0;
    uint8_t tmp_out;
    (void)tmp_out;
    int rc = 0;
    // build successor table (same as unbwt)
    {
        int64_t R[256] = {};
        for (int64_t i = 0; i < n; ++i) ++R[L[i]];
        int64_t k = n;
        for (int c = 256; c--;) R[c] = (k -= R[c]);
        if (sentinel_large) {
            for (int64_t i = 0; i < base; ++i) P[i] = (int32_t)R[L[i]]++;
            for (int64_t i = base + 1; i < n; ++i) P[i] = (int32_t)R[L[i]]++;
            P[base] = (int32_t)R[L[base]]++;
        } else {
            P[base] = (int32_t)R[L[base]]++;
            for (int64_t i = 0; i < base; ++i) P[i] = (int32_t)R[L[i]]++;
            for (int64_t i = base + 1; i < n; ++i) P[i] = (int32_t)R[L[i]]++;
        }
    }
    memset(seen, 0, (size_t)n);
    int32_t k = (int32_t)base;
    for (int64_t i = 0; i < n; ++i) {
        if (seen[k]) { rc = -1; break; }
        seen[k] = 1;
        k = P[k];
    }
    return rc;
}

// ---------------------------------------------------------------------------
// Bit-stream codec (a6 semantics: codes packed LSB-first at increasing bit
// offsets into 32-bit little-endian words, a6/src/coder.c:108-123).
// code_values/code_lengths indexed by symbol.  Returns total bits.
// ---------------------------------------------------------------------------
int64_t archon_bitpack(const uint8_t* data, int64_t n,
                       const uint32_t* code_values, const uint8_t* code_lengths,
                       uint32_t* words) {
    int64_t k = 0;
    words[0] = 0;
    for (int64_t i = 0; i < n; ++i) {
        const uint32_t c = code_values[data[i]];
        const int len = code_lengths[data[i]];
        const int64_t k2 = k + len;
        words[k >> 5] |= c << (k & 31);
        if ((k >> 5) != (k2 >> 5))
            words[k2 >> 5] = (len && (k & 31)) ? (c >> (32 - (k & 31))) : 0;
        k = k2;
    }
    return k;
}

// Decode n symbols from the packed stream.  The a6 stream is *backward*
// decodable by construction: codes are packed LSB-first from their start
// offset, so reading bits downward from a codeword's END yields the code
// MSB-first, where the Huffman prefix-free property makes greedy matching
// unique (this is exactly how the reference's sort and get_char consume the
// stream, a6/src/bwt.c:112-144).  A forward LSB-aligned match would be
// ambiguous.  Decodes back-to-front, emitting into out[n-1]..out[0].
int64_t archon_bitunpack(const uint32_t* words, int64_t total_bits,
                         const uint32_t* code_values, const uint8_t* code_lengths,
                         uint8_t* out, int64_t n) {
    int64_t pos = total_bits;
    for (int64_t j = n; j-- > 0;) {
        // a codeword ends at pos: its MSB sits at stream bit pos-1, so
        // accumulating bits pos-1, pos-2, ... MSB-first rebuilds the code
        uint32_t acc = 0;
        int l = 0, sym = -1;
        while (l < 33 && l <= pos) {
            ++l;
            const int64_t b = pos - l;
            acc = (acc << 1) | ((words[b >> 5] >> (b & 31)) & 1u);
            for (int s = 0; s < 256; ++s) {
                if (code_lengths[s] == l && code_values[s] == acc) {
                    sym = s;
                    break;
                }
            }
            if (sym >= 0) break;
        }
        if (sym < 0) return -1;
        out[j] = (uint8_t)sym;
        pos -= l;
    }
    return pos;  // 0 when the stream was fully consumed
}

// ---------------------------------------------------------------------------
// mmap block reader: data-loader for the streaming pipeline.
// ---------------------------------------------------------------------------
struct ArchonMap {
    void* addr;
    int64_t size;
    int fd;
};

void* archon_map_open(const char* path, int64_t* size_out) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return nullptr;
    struct stat st;
    if (fstat(fd, &st) != 0) {
        close(fd);
        return nullptr;
    }
    void* addr = nullptr;
    if (st.st_size > 0) {
        addr = mmap(nullptr, (size_t)st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
        if (addr == MAP_FAILED) {
            close(fd);
            return nullptr;
        }
        madvise(addr, (size_t)st.st_size, MADV_SEQUENTIAL);
    }
    ArchonMap* m = new ArchonMap{addr, (int64_t)st.st_size, fd};
    *size_out = m->size;
    return m;
}

const uint8_t* archon_map_data(void* handle) {
    return (const uint8_t*)((ArchonMap*)handle)->addr;
}

void archon_map_close(void* handle) {
    ArchonMap* m = (ArchonMap*)handle;
    if (m->addr) munmap(m->addr, (size_t)m->size);
    close(m->fd);
    delete m;
}

}  // extern "C"

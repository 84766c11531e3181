// Native host-side transport kernels (C ABI, bound via ctypes).
//
// The reference implements its whole transport layer in C (src/frame.c,
// src/output.c); in this framework the transport runs on the host next to
// the TPU compute path, and these kernels keep the per-packet byte work
// (CRC scans, HDLC delimiting/unescaping, PDU packet extraction) native so
// multi-station real-time factors aren't bounded by the Python interpreter.
//
// Build: cc -O2 -shared -fPIC host_ops.cpp -o libnrsc5host.so
// (see nrsc5_tpu/native/__init__.py for the lazy build + fallback.)

#include <cstdint>
#include <cstddef>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// CRC-8, poly 0x31 MSB-first, init 0xFF (reference: src/frame.c:60-136)
// ---------------------------------------------------------------------------
static uint8_t crc8_table[256];
static int crc8_init_done = 0;

static void crc8_init() {
    for (int i = 0; i < 256; i++) {
        uint8_t c = (uint8_t)i;
        for (int k = 0; k < 8; k++)
            c = (c & 0x80) ? (uint8_t)((c << 1) ^ 0x31) : (uint8_t)(c << 1);
        crc8_table[i] = c;
    }
    crc8_init_done = 1;
}

uint8_t nrsc5_crc8(const uint8_t* data, size_t len) {
    if (!crc8_init_done) crc8_init();
    uint8_t c = 0xFF;
    for (size_t i = 0; i < len; i++)
        c = crc8_table[c ^ data[i]];
    return c;
}

// Batched CRC check over packets at given offsets/lengths (+1 CRC byte).
// results[i] = 1 if packet i fails its CRC.
void nrsc5_crc8_packets(const uint8_t* buf, const int32_t* offsets,
                        const int32_t* lengths, int n, uint8_t* bad) {
    for (int i = 0; i < n; i++)
        bad[i] = nrsc5_crc8(buf + offsets[i], (size_t)lengths[i] + 1) != 0;
}

// ---------------------------------------------------------------------------
// HDLC FCS-16 (X.25, reflected 0x8408; reference: src/frame.c:138-144)
// ---------------------------------------------------------------------------
static uint16_t fcs_table[256];
static int fcs_init_done = 0;

static void fcs_init() {
    for (int i = 0; i < 256; i++) {
        uint16_t c = (uint16_t)i;
        for (int k = 0; k < 8; k++)
            c = (c & 1) ? (uint16_t)((c >> 1) ^ 0x8408) : (uint16_t)(c >> 1);
        fcs_table[i] = c;
    }
    fcs_init_done = 1;
}

uint16_t nrsc5_fcs16(const uint8_t* data, size_t len) {
    if (!fcs_init_done) fcs_init();
    uint16_t c = 0xFFFF;
    for (size_t i = 0; i < len; i++)
        c = (uint16_t)((c >> 8) ^ fcs_table[(c ^ data[i]) & 0xFF]);
    return c;
}

// ---------------------------------------------------------------------------
// HDLC unescape (0x7D escape; reference: src/frame.c:328-341)
// out must have room for len bytes.  Returns output length.
// ---------------------------------------------------------------------------
size_t nrsc5_hdlc_unescape(const uint8_t* data, size_t len, uint8_t* out) {
    size_t o = 0;
    for (size_t i = 0; i < len; i++) {
        if (data[i] == 0x7D && i + 1 < len) {
            out[o++] = data[i + 1] | 0x20;
            i++;
        } else {
            out[o++] = data[i];
        }
    }
    return o;
}

// ---------------------------------------------------------------------------
// HDLC frame splitter: scan a byte region for 0x7E-delimited frames.
// Emits (start, length) pairs of the raw (still-escaped) frame bodies that
// are CLOSED within the region; `carry` semantics are handled by the
// caller.  Returns the number of frames found; starts/lengths arrays must
// hold at most len/2+1 entries.
// ---------------------------------------------------------------------------
int nrsc5_hdlc_split(const uint8_t* data, size_t len,
                     int32_t* starts, int32_t* lengths) {
    int n = 0;
    long start = -1;
    for (size_t i = 0; i < len; i++) {
        if (data[i] == 0x7E) {
            if (start >= 0) {
                starts[n] = (int32_t)start;
                lengths[n] = (int32_t)(i - (size_t)start);
                n++;
            }
            start = (long)i + 1;
        }
    }
    return n;
}

// ---------------------------------------------------------------------------
// Unescape + FCS check + protocol filter in one pass: returns payload
// length (without FCS) if the frame is a valid AAS frame (protocol 0x21),
// else 0.  out must have room for len bytes.
// (reference: src/frame.c:343-367)
// ---------------------------------------------------------------------------
size_t nrsc5_aas_frame(const uint8_t* data, size_t len, uint8_t* out) {
    size_t n = nrsc5_hdlc_unescape(data, len, out);
    if (n < 4) return 0;             // proto + 2 FCS minimum, allow empty
    if (nrsc5_fcs16(out, n) != 0xF0B8) return 0;
    if (out[0] != 0x21) return 0;
    return n - 2;                     // strip FCS
}

}  // extern "C"

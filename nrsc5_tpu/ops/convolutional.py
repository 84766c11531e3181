"""Convolutional FEC: encoder + TPU-native Viterbi decoder.

NRSC-5 uses three rate-1/3 tail-biting mother codes (reference:
src/decode.c:39-61, src/conv_dec.c:455-478):

  * K=7, G=(0133,0171,0165)  - FM P1/PIDS/P3/P4
  * K=9, G=(0561,0657,0711)  - AM "E1" (P1, P3 in MA3)
  * K=9, G=(0561,0753,0711)  - AM "E2/E3" (P3 in MA1, AM PIDS)

punctured per channel (see constants.PUNCTURE_*).

Encoder convention (protocol-defined; cross-checked against the reference
re-encoder, src/decode.c:234-259): shift register r holds the most recent K
input bits with the *newest at the MSB* (``r = (r >> 1) | (bit << (K-1))``),
output j is ``parity(r & G[j])``.  Tail-biting: r is pre-loaded with the last
K-1 bits of the frame.

Decoder design (TPU-first, not a port): the trellis state dimension (64 or
256) is vectorized across VPU lanes, batch (stations x channels x frames)
across sublanes, and the time recursion is a single ``lax.scan`` carrying the
path-metric vector.  Tail-biting is handled as in the reference
(src/conv_dec.c:407-412): the trellis is extended by 32 wrap steps on each
side and the warm-up decisions are discarded.  Metrics are float32 so no
renormalization is needed.  Two throughput variants build on the same core:
:func:`viterbi_decode_chunked` (circular overlapping segments decoded in
parallel) and the radix-2^r ACS (r trellis steps per scan step).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

TAIL_BITING_EXTRA = 32  # wrap steps on each side (reference: src/conv_dec.c:43)


# ---------------------------------------------------------------------------
# Shared trellis tables
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _parity_table(nbits: int) -> np.ndarray:
    v = np.arange(1 << nbits, dtype=np.uint32)
    p = v & 1
    while nbits > 1:
        v >>= 1
        p ^= v & 1
        nbits -= 1
    return p.astype(np.uint8)


@functools.lru_cache(maxsize=8)
def trellis_tables(k: int, gens: tuple[int, int, int]):
    """Precompute the ACS tables for a rate-1/3 code.

    For each next-state s' (k-1 bits, MSB = newest input bit):
      * input bit        b(s')  = s' >> (k-2)
      * predecessors     pred_p = ((s' << 1) & (ns-1)) | p   for p in {0,1}
      * branch outputs   out[s', p, j] = 2*parity((pred_p | b<<(k-1)) & G_j)-1

    Returns (pred0, pred1, out_nrz) as numpy arrays; out_nrz is
    [ns, 2, 3] float32 in {-1,+1}.
    """
    ns = 1 << (k - 1)
    par = _parity_table(k)
    sp = np.arange(ns, dtype=np.int32)
    b = sp >> (k - 2)
    pred0 = (sp << 1) & (ns - 1)
    pred1 = pred0 | 1
    out = np.empty((ns, 2, 3), dtype=np.float32)
    for p, pred in ((0, pred0), (1, pred1)):
        full = pred | (b << (k - 1))
        for j, g in enumerate(gens):
            out[:, p, j] = par[full & g].astype(np.float32) * 2.0 - 1.0
    return pred0, pred1, out


# ---------------------------------------------------------------------------
# Encoder (numpy; used by the truth harness and the BER re-encoder)
# ---------------------------------------------------------------------------

def conv_encode(bits: np.ndarray, k: int, gens: tuple[int, int, int]) -> np.ndarray:
    """Tail-biting rate-1/3 encode.  bits: [..., T] in {0,1} ->
    [..., T*3] mother-code bits (output order G0,G1,G2 per input bit)."""
    bits = np.asarray(bits, dtype=np.uint32)
    t = bits.shape[-1]
    par = _parity_table(k)
    # full register value after step i: bit (i-d mod T) at position k-1-d
    reg = np.zeros(bits.shape, dtype=np.uint32)
    for d in range(k):
        reg |= np.roll(bits, d, axis=-1) << (k - 1 - d)
    out = np.empty(bits.shape[:-1] + (t, 3), dtype=np.uint8)
    for j, g in enumerate(gens):
        out[..., j] = par[reg & g]
    return out.reshape(bits.shape[:-1] + (t * 3,))


def puncture(coded: np.ndarray, pattern: tuple[int, ...]) -> np.ndarray:
    """Drop mother-code bits where the repeating pattern is 0."""
    t = coded.shape[-1]
    mask = np.resize(np.asarray(pattern, dtype=bool), t)
    return coded[..., mask]


@functools.lru_cache(maxsize=16)
def depuncture_indices(pattern: tuple[int, ...], coded_len: int):
    """Index table mapping punctured stream -> mother-code positions.

    Returns (idx, valid): for mother position i, ``idx[i]`` is the position in
    the punctured stream (or 0) and ``valid[i]`` is 1 where a symbol exists.
    ``depunctured = where(valid, punctured[idx], 0)``.
    """
    mask = np.resize(np.asarray(pattern, dtype=bool), coded_len)
    idx = np.cumsum(mask) - 1
    idx[~mask] = 0
    return idx.astype(np.int32), mask


def depuncture(llr, pattern: tuple[int, ...], coded_len: int):
    """Insert zero-LLRs at punctured positions (jnp or numpy).

    For jnp inputs whose length tiles the pattern exactly, this is a pure
    reshape/stack (one column per pattern position, zeros where punctured)
    — no gather on the device hot path."""
    if isinstance(llr, jax.Array) and coded_len % len(pattern) == 0:
        period = len(pattern)
        kept = int(sum(pattern))
        cols = llr.reshape(llr.shape[:-1] + (coded_len // period, kept))
        zero = jnp.zeros(cols.shape[:-1], llr.dtype)
        out_cols = []
        ki = 0
        for bit in pattern:
            if bit:
                out_cols.append(cols[..., ki])
                ki += 1
            else:
                out_cols.append(zero)
        return jnp.stack(out_cols, axis=-1).reshape(
            llr.shape[:-1] + (coded_len,))
    idx, valid = depuncture_indices(pattern, coded_len)
    taken = llr[..., idx]
    return jnp.where(valid, taken, 0) if isinstance(llr, jax.Array) \
        else np.where(valid, taken, 0)


# ---------------------------------------------------------------------------
# Viterbi decoder (JAX)
# ---------------------------------------------------------------------------

def _acs_traceback(ext, k: int, gens: tuple[int, int, int], unroll: int = 8,
                   fuse: int = 1):
    """ACS forward recursion + traceback over an extended LLR sequence.

    ext: [B, L, 3] float32, L divisible by ``fuse``.  Free boundary
    conditions (uniform initial metrics, traceback from the max-metric
    final state).  Returns (bits [B, L] uint8, metric margin [B] float32).

    TPU shaping: the predecessor maps pred0 = (s'<<1) & (ns-1) and
    pred1 = pred0 | 1 are *strided tilings*, not general permutations —
    pm[pred0] = tile(pm[0::2], 2) — so the ACS step is pure
    reshape/concat/elementwise (no gathers on the hot path).  Branch
    metrics are three broadcast FMAs against static ±1 sign vectors (no
    thin [B,3]x[3,ns] matmuls — MXU-hostile shapes).  Survivor decisions
    are packed into int32 words of 32 states (reshape/shift/sum) so the
    traceback is a vectorized bit-shift instead of a per-step gather.

    ``fuse`` chains that many radix-1 butterflies inside one scan step:
    unlike the radix-2^r ACS it keeps the radix-1 arithmetic (2 adds +
    1 select per state per trellis step vs 2^r candidates), cuts the scan
    trip count by ``fuse``, and stays *bit-identical* to the fuse=1
    recursion (identical op order per substep).
    """
    _, _, out_np = trellis_tables(k, gens)
    ns = 1 << (k - 1)
    half = ns // 2

    # static ±1 sign rows: bm_p[B, ns] = sum_j llr[:, j] * sgn[p][j][ns]
    sgn0 = [jnp.asarray(out_np[:, 0, j]) for j in range(3)]  # each [ns]
    sgn1 = [jnp.asarray(out_np[:, 1, j]) for j in range(3)]
    nw = ns // 32
    shifts32 = jnp.asarray(np.arange(32, dtype=np.int32))

    def acs(pm, llr_t):
        # pm: [B, ns]; llr_t: [B, 3]
        l0, l1, l2 = llr_t[:, 0:1], llr_t[:, 1:2], llr_t[:, 2:3]
        bm0 = l0 * sgn0[0] + l1 * sgn0[1] + l2 * sgn0[2]  # [B, ns]
        bm1 = l0 * sgn1[0] + l1 * sgn1[1] + l2 * sgn1[2]
        pairs = pm.reshape(-1, half, 2)
        ev = jnp.concatenate([pairs[:, :, 0], pairs[:, :, 0]], axis=1)
        od = jnp.concatenate([pairs[:, :, 1], pairs[:, :, 1]], axis=1)
        c0 = ev + bm0
        c1 = od + bm1
        dec = c1 > c0
        # pack decisions: words[b, w] = sum_s dec[b, 32w+s] << s
        packed = (dec.astype(jnp.int32).reshape(-1, nw, 32)
                  << shifts32).sum(axis=-1)
        return jnp.where(dec, c1, c0), packed

    def step(pm, llr_f):
        # llr_f: [fuse, B, 3] — chain `fuse` butterflies per scan step
        packs = []
        for i in range(fuse):
            pm, p = acs(pm, llr_f[i])
            packs.append(p)
        return pm, jnp.stack(packs)

    b_, l, _ = ext.shape
    assert l % fuse == 0, (l, fuse)
    xs = jnp.swapaxes(ext, 0, 1).reshape(l // fuse, fuse, b_, 3)
    pm0 = jnp.zeros((b_, ns), dtype=jnp.float32)
    pm, decisions = jax.lax.scan(step, pm0, xs, unroll=unroll)
    # decisions: [L/fuse, fuse, B, nw] int32 packed survivor bits

    top2 = jax.lax.top_k(pm, 2)[0]
    margin = top2[:, 0] - top2[:, 1]
    state0 = jnp.argmax(pm, axis=-1).astype(jnp.int32)

    def tb(state, dec_t):
        # dec_t: [B, nw] packed; state: [B]
        if nw == 1:
            word = dec_t[:, 0]
        elif nw == 2:
            word = jnp.where(state < 32, dec_t[:, 0], dec_t[:, 1])
        else:
            # one-hot word select (no gather; nw is 8 for K=9)
            widx = state >> 5
            oh = (jnp.arange(nw, dtype=jnp.int32)[None, :]
                  == widx[:, None])
            word = jnp.where(oh, dec_t, 0).sum(axis=-1)
        p = (word >> (state & 31)) & 1
        bit = (state >> (k - 2)).astype(jnp.uint8)
        prev = ((state << 1) & (ns - 1)) | p
        return prev, bit

    def tb_step(state, dec_f):
        # dec_f: [fuse, B, nw]; walk the fused substeps newest-first
        bits = []
        for i in reversed(range(fuse)):
            state, b = tb(state, dec_f[i])
            bits.append(b)
        return state, jnp.stack(bits[::-1])  # [fuse, B] time-ascending

    _, bits_rev = jax.lax.scan(tb_step, state0, decisions[::-1],
                               unroll=unroll)
    # bits_rev: [L/fuse, fuse, B], scan steps reversed, substeps ascending
    bits = bits_rev[::-1].reshape(l, b_)
    return jnp.swapaxes(bits, 0, 1), margin


@functools.lru_cache(maxsize=16)
def _radix_tables(k: int, gens: tuple[int, int, int], r: int):
    """Multi-step trellis tables: r input bits per super-step.

    For each next-state s' (k-1 bits) and predecessor low bits j (r bits),
    the start state is ((s' << r) & (ns-1)) | j and the r transited inputs
    are the top r bits of s' (oldest first).  Returns out_r
    [ns, 2^r, 3r] float32 in {-1,+1}: the 3r coded outputs along that path.
    """
    assert 1 <= r <= k - 1
    ns = 1 << (k - 1)
    par = _parity_table(k)
    sp = np.arange(ns, dtype=np.int64)[:, None]
    j = np.arange(1 << r, dtype=np.int64)[None, :]
    state = ((sp << r) & (ns - 1)) | j  # start state of the path
    out = np.empty((ns, 1 << r, 3 * r), dtype=np.float32)
    for step in range(r):
        # input bit at this step: bit (k-2 - (r-1-step)) of s'... the bits
        # enter newest-at-MSB, so step 0 consumes the OLDEST of the r bits,
        # which sits at position (k-1-r+step) of s'.
        b = (sp >> (k - 1 - r + step)) & 1
        full = state | (b << (k - 1))
        for g_i, g in enumerate(gens):
            out[:, :, 3 * step + g_i] = par[full & g] * 2.0 - 1.0
        state = full >> 1  # advance the register
    return out


def _acs_traceback_radix(ext, k: int, gens: tuple[int, int, int], r: int,
                         unroll: int = 2, fuse: int = 1):
    """Radix-2^r ACS: r trellis steps per scan step — cuts the sequential
    scan length by r at ~2^r/2 x the per-step arithmetic, a win on TPU
    where tiny-step scans are launch-latency-bound.

    ext: [B, L, 3] float32 with L divisible by r*fuse.
    Returns (bits [B, L] uint8, margin [B] float32).

    ``fuse`` chains that many radix super-steps inside one scan iteration
    (trip count L/(r*fuse)) with per-substep arithmetic unchanged, so the
    result is bit-identical to the fuse=1 radix recursion.  Unlike the
    scan ``unroll`` knob this also statically indexes the per-substep
    inputs (no dynamic-slice bookkeeping inside the loop body).

    NB: branch metrics are summed in a different association order than the
    radix-1 recursion, so float-level near-ties can resolve differently —
    the result is an equally-likely ML path, not always the bit-identical
    one (observed ~1 bit per 20k at Es/N0 around 3 dB, none at operating
    SNRs).
    """
    if r == 1:
        return _acs_traceback(ext, k, gens, fuse=max(fuse, 1))
    out_np = _radix_tables(k, gens, r)
    ns = 1 << (k - 1)
    nr = 1 << r
    group = ns >> r
    b_, l, _ = ext.shape
    assert l % (r * fuse) == 0, (l, r, fuse)
    out_flat = jnp.asarray(out_np.reshape(ns * nr, 3 * r))

    chunks = ext.reshape(b_, l // r, 3 * r)

    def acs(pm, llr_t):
        # pm: [B, ns]; llr_t: [B, 3r]
        bm = (llr_t @ out_flat.T).reshape(-1, ns, nr)
        pm_pred = jnp.tile(pm.reshape(-1, group, nr), (1, nr, 1))
        cand = pm_pred + bm  # [B, ns, nr]
        dec = jnp.argmax(cand, axis=-1).astype(jnp.int8)  # r <= 7 bits
        return jnp.max(cand, axis=-1), dec

    pm0 = jnp.zeros((b_, ns), dtype=jnp.float32)
    xs = jnp.swapaxes(chunks, 0, 1)
    if fuse > 1:
        def fstep(pm, llr_f):
            # llr_f: [fuse, B, 3r]
            decs = []
            for i in range(fuse):
                pm, d = acs(pm, llr_f[i])
                decs.append(d)
            return pm, jnp.stack(decs)

        xs = xs.reshape(l // r // fuse, fuse, b_, 3 * r)
        pm, decisions = jax.lax.scan(fstep, pm0, xs, unroll=unroll)
    else:
        pm, decisions = jax.lax.scan(acs, pm0, xs, unroll=unroll)
        decisions = decisions[:, None]
    # decisions: [L/(r*fuse), fuse, B, ns] int8

    top2 = jax.lax.top_k(pm, 2)[0]
    margin = top2[:, 0] - top2[:, 1]
    state0 = jnp.argmax(pm, axis=-1).astype(jnp.int32)

    # bit i of the super-step (time-ascending) sits at position k-1-r+i
    shifts = jnp.asarray(np.arange(r) + (k - 1 - r), np.int32)

    if os.environ.get("NRSC5_VITERBI_TB", "onehot") == "gather":
        def tb(state, dec_t):
            j = jnp.take_along_axis(dec_t, state[:, None],
                                    axis=-1)[:, 0].astype(jnp.int32)
            bits = ((state[:, None] >> shifts[None, :]) & 1) \
                .astype(jnp.uint8)
            prev = ((state << r) & (ns - 1)) | j
            return prev, bits

        tb_unroll = unroll
    else:
        # arithmetic traceback: the per-step survivor lookup dec_t[state]
        # becomes a one-hot multiply-reduce over the tiny state axis —
        # pure VPU elementwise work, no gathers (device gathers are the
        # slow path on this target; cf. the round-1 deinterleaver finding)
        iota = jnp.arange(ns, dtype=jnp.int32)

        def tb(state, dec_t):
            oh = (iota[None, :] == state[:, None])
            j = jnp.where(oh, dec_t.astype(jnp.int32), 0).sum(axis=-1)
            bits = ((state[:, None] >> shifts[None, :]) & 1) \
                .astype(jnp.uint8)
            prev = ((state << r) & (ns - 1)) | j
            return prev, bits

        tb_unroll = max(unroll, 4)

    def tb_step(state, dec_f):
        # dec_f: [fuse, B, ns]; walk the fused substeps newest-first
        bits = []
        for i in reversed(range(fuse)):
            state, bi = tb(state, dec_f[i])
            bits.append(bi)
        return state, jnp.stack(bits[::-1])  # [fuse, B, r] time-ascending

    _, bits_rev = jax.lax.scan(tb_step, state0, decisions[::-1],
                               unroll=tb_unroll)
    # bits_rev: [L/(r*fuse), fuse, B, r] — scan steps reversed, substeps
    # ascending, bits within a super-step ordered
    bits = bits_rev[::-1].reshape(l // r, b_, r)
    bits = jnp.swapaxes(bits, 0, 1).reshape(b_, l)
    return bits, margin


def _viterbi_impl(llr, k: int, gens: tuple[int, int, int], radix: int = 1,
                  fuse: int = 1):
    """Core tail-biting Viterbi.  llr: [B, T, 3] float32 (positive = bit 1).
    Returns (bits [B, T] uint8, metric margin [B] float32)."""
    t = llr.shape[-2]
    wrap = min(TAIL_BITING_EXTRA, t)
    # extend sequence for tail-biting wrap (reference: src/conv_dec.c:407-412)
    ext = jnp.concatenate([llr[:, t - wrap:, :], llr, llr[:, :wrap, :]], axis=1)
    if radix > 1 and ext.shape[1] % radix == 0:
        if fuse > 1 and ext.shape[1] % (radix * fuse):
            fuse = 1  # exactness first: no padding on the sequential path
        bits, margin = _acs_traceback_radix(ext, k, gens, radix, fuse=fuse)
    else:
        if fuse > 1 and ext.shape[1] % fuse:
            fuse = 1  # exactness first: no padding on the sequential path
        bits, margin = _acs_traceback(ext, k, gens, fuse=fuse)
    # steps [wrap, T+wrap) map to frame positions [0, T)
    return bits[:, wrap:wrap + t], margin


@functools.lru_cache(maxsize=32)
def _chunk_plan(t: int, chunk: int, overlap: int, multiple: int = 1):
    """Static plan for the overlapping-chunk Viterbi.

    The tail-biting frame is circular, so it is cut into ``n`` near-equal
    segments; segment i covers frame positions [b_i - overlap, b_{i+1} +
    overlap) mod t and only the middle [b_i, b_{i+1}) survivor bits are
    kept.  ``multiple`` rounds the segment length up to a multiple of
    radix*fuse by growing the trailing overlap with REAL wrapped LLRs —
    never zero padding: a zero-LLR final step ties every state's top-2
    final metrics exactly, collapsing the margin diagnostic to 0 on a
    clean carrier (which false-trips the serve watchdog).
    Returns (seg_idx [n, L], src_chunk [t], src_off [t]).
    """
    n = max(1, -(-t // chunk))
    bounds = np.floor(np.linspace(0, t, n + 1)).astype(np.int64)
    keep = np.diff(bounds)
    length = int(keep.max() + 2 * overlap)
    length += (-length) % multiple
    seg_idx = ((bounds[:-1, None] - overlap + np.arange(length)[None, :]) % t
               ).astype(np.int32)
    pos = np.arange(t)
    src_chunk = (np.searchsorted(bounds, pos, side="right") - 1).astype(np.int32)
    src_off = (overlap + pos - bounds[src_chunk]).astype(np.int32)
    return seg_idx, src_chunk, src_off


@functools.partial(jax.jit,
                   static_argnames=("k", "gens", "chunk", "overlap", "radix",
                                    "unroll", "fuse"))
def viterbi_decode_chunked(llr, k: int, gens: tuple[int, int, int],
                           chunk: int = 1024, overlap: int = 96,
                           radix: int = 4, unroll: int = 2, fuse: int = 1):
    """Chunk-parallel tail-biting Viterbi (the TPU-throughput variant).

    The sequential trellis recursion is the reference's only hot kernel that
    resists batching (src/conv_dec.c:402-427 runs 146k serial ACS steps per
    FM frame).  Here the circular frame is split into overlapping segments
    decoded *in parallel* with free boundary metrics; survivor paths merge
    within ~5K trellis steps with overwhelming probability, so discarding
    ``overlap`` warm-up steps on each side reproduces the Viterbi path
    exactly (checked in tests against :func:`viterbi_decode`; the re-encode
    BER gate, as in src/decode.c:234-277, guards it at runtime).  This turns
    a T-step scan into a ceil(T/chunk)-way batched (T/n)-step scan — the
    batch dimension fills VPU lanes.

    llr: [..., T, 3].  Returns (bits [..., T] uint8, margin [...] float32
    — the minimum per-segment metric margin, a conservative diagnostic).
    """
    llr = jnp.asarray(llr, dtype=jnp.float32)
    t = llr.shape[-2]
    if chunk + 2 * overlap >= t:
        return viterbi_decode(llr, k, gens)
    batch_shape = llr.shape[:-2]
    # segment length is rounded up to a multiple of radix*fuse inside the
    # plan (extra trailing-overlap steps of REAL wrapped LLRs, never zero
    # padding — zero-LLR final steps tie the top-2 metrics and zero the
    # margin diagnostic on clean signal)
    seg_idx, src_chunk, src_off = _chunk_plan(
        t, chunk, overlap, multiple=max(radix, 1) * max(fuse, 1))
    n, length = seg_idx.shape
    segs = llr[..., jnp.asarray(seg_idx), :]  # [..., n, L, 3]
    flat = segs.reshape((-1, length, 3))
    if radix > 1:
        bits_seg, margins = _acs_traceback_radix(flat, k, gens, radix,
                                                 unroll=unroll, fuse=fuse)
    elif fuse > 1:
        bits_seg, margins = _acs_traceback(flat, k, gens, unroll=unroll,
                                           fuse=fuse)
    else:
        bits_seg, margins = _acs_traceback(flat, k, gens)
    bits_seg = bits_seg.reshape(batch_shape + (n, length))
    bits = bits_seg[..., jnp.asarray(src_chunk), jnp.asarray(src_off)]
    margin = margins.reshape(batch_shape + (n,)).min(axis=-1)
    return bits, margin


def conv_encode_dev(bits, k: int, gens: tuple[int, int, int]):
    """Device-side tail-biting re-encode (for BER estimation; reference:
    src/decode.c:234-259).  bits: [..., T] uint8 -> [..., T, 3] uint8.

    Parity is computed with shift-xor folding (pure VPU) rather than a
    table gather."""
    reg = jnp.zeros(bits.shape, jnp.int32)
    for d in range(k):
        reg = reg | (jnp.roll(bits, d, axis=-1).astype(jnp.int32)
                     << (k - 1 - d))

    def parity(v):
        v = v ^ (v >> 8)
        v = v ^ (v >> 4)
        v = v ^ (v >> 2)
        v = v ^ (v >> 1)
        return (v & 1).astype(jnp.uint8)

    outs = [parity(reg & g) for g in gens]
    return jnp.stack(outs, axis=-1)


def reencode_bit_errors(llr_full, bits_scrambled, k: int,
                        gens: tuple[int, int, int],
                        pattern: tuple[int, ...]):
    """Count demod-vs-reencode disagreements at unpunctured positions
    (reference: src/decode.c:234-277).  llr_full: [T, 3] depunctured soft
    bits; bits_scrambled: [T] Viterbi output before descrambling."""
    enc = conv_encode_dev(bits_scrambled, k, gens)
    t = bits_scrambled.shape[-1]
    mask = jnp.asarray(np.resize(np.asarray(pattern, bool), t * 3)
                       .reshape(t, 3))
    hard = llr_full > 0
    return (mask & (hard != (enc > 0))).sum()


@functools.partial(jax.jit, static_argnames=("k", "gens"))
def viterbi_decode(llr, k: int, gens: tuple[int, int, int]):
    """Batched tail-biting Viterbi decode.

    llr: [..., T, 3] float or int8 soft symbols (sign convention of the
    reference demod: positive = bit 1).  Returns (bits [..., T] uint8,
    margin [...] float32).
    """
    llr = jnp.asarray(llr, dtype=jnp.float32)
    batch_shape = llr.shape[:-2]
    flat = llr.reshape((-1,) + llr.shape[-2:])
    bits, margin = _viterbi_impl(flat, k, gens)
    return bits.reshape(batch_shape + bits.shape[-1:]), margin.reshape(batch_shape)

"""Posting-list compression: FOR bit-packed blocks of 128 + VByte tail.

Spark-first restatement of the reference's block postings encoding
(codecs/lucene50/Lucene50PostingsFormat.java:397 BLOCK_SIZE=128;
ForUtil.java:39-116 bit-packed frame-of-reference, bpv=0 when all values
equal; Lucene50PostingsWriter.java:330-350 VInt tail with the
``(delta<<1)|1`` freq==1 trick).  We keep the invariants (delta-coded
strictly-increasing docIDs, 128-blocks, degenerate all-equal blocks cost
~0 bits, VByte tail) but lay blocks out as parquet BINARY cells rather
than .doc files — the segment file is an Iceberg/parquet row group.

All encode/decode paths are vectorized numpy (these run inside Arrow
batches on executors; per-row Python would dominate the build at scale).

Layout of one encoded block payload (bytes):
    [1 byte bpv_doc][1 byte bpv_tf][packed doc deltas][packed tf-1]
    bpv==0 -> 8-byte LE uint64 single value for all entries (64-bit-clean:
    doc deltas can exceed 2^32 at 10^12-doc global docID scale)
Tail blocks (<128 entries) are VByte of the interleaved Lucene tail
stream: for each entry, (delta<<1)|1 if tf==1 else (delta<<1, tf).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # Lucene50PostingsFormat.java:397


# ---------------------------------------------------------------- VByte


def vbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized variable-byte encode of uint64 values (7 bits/byte,
    high bit = continuation, little-endian groups like Lucene VInt)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed = ceil(bit_length / 7), min 1
    bl = np.zeros(v.size, dtype=np.int64)
    tmp = v.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        bl[nz] += 1
        tmp = tmp >> np.uint64(7)
    nbytes = np.maximum(bl, 1)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    pos = np.zeros(v.size, dtype=np.int64)
    pos[1:] = np.cumsum(nbytes)[:-1]
    shift = np.zeros(v.size, dtype=np.uint64)
    remaining = nbytes.copy()
    cur = pos.copy()
    work = v.copy()
    while (remaining > 0).any():
        active = remaining > 0
        byte = (work[active] & np.uint64(0x7F)).astype(np.uint8)
        more = remaining[active] > 1
        byte = byte | (more.astype(np.uint8) << 7)
        out[cur[active]] = byte
        work[active] = work[active] >> np.uint64(7)
        cur[active] += 1
        remaining[active] -= 1
    return out.tobytes()


def vbyte_decode(data: bytes, count: int) -> np.ndarray:
    """Decode `count` VByte values. Vectorized via cumulative group ends."""
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(data, dtype=np.uint8)
    is_last = (raw & 0x80) == 0
    ends = np.flatnonzero(is_last)[:count]
    starts = np.empty(count, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    out = np.zeros(count, dtype=np.uint64)
    maxlen = int((ends - starts).max()) + 1
    for i in range(maxlen):
        idx = starts + i
        active = idx <= ends
        out[active] |= (raw[idx[active]] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(
            7 * i
        )
    return out


# ----------------------------------------------------- FOR bit-packing


def _pack_bits(values: np.ndarray, bpv: int) -> bytes:
    """Pack unsigned values at bpv bits each (little-endian bit order);
    bpv may be up to 63 (64-bit-clean: at 10^12 global docIDs a sparse
    term's doc DELTAS can exceed 2^32 — hypothesis found the truncation)."""
    if bpv == 0:
        return b""
    bits = ((values[:, None].astype(np.uint64) >> np.arange(bpv, dtype=np.uint64))
            & np.uint64(1)).astype(np.uint8)
    flat = bits.reshape(-1)
    pad = (-flat.size) % 8
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, dtype=np.uint8)])
    return np.packbits(flat, bitorder="little").tobytes()


def _unpack_bits(data: np.ndarray, count: int, bpv: int) -> np.ndarray:
    if bpv == 0:
        return np.zeros(count, dtype=np.uint64)
    flat = np.unpackbits(data, bitorder="little")[: count * bpv]
    bits = flat.reshape(count, bpv).astype(np.uint64)
    vals = (bits << np.arange(bpv, dtype=np.uint64)).sum(axis=1)
    return vals.astype(np.uint64)


def _bpv(values: np.ndarray) -> int:
    m = int(values.max()) if values.size else 0
    return int(m).bit_length()


def encode_full_block(deltas: np.ndarray, tfs: np.ndarray) -> bytes:
    """Encode one full 128-entry block: FOR bit-packed deltas + (tf-1)."""
    assert deltas.size == BLOCK_SIZE
    d = deltas.astype(np.uint64)
    t = (tfs.astype(np.uint64) - 1)
    bpv_d, bpv_t = _bpv(d), _bpv(t)
    parts = [bytes([bpv_d, bpv_t])]
    if bpv_d == 0:  # all-equal block: single 8-byte value (ForUtil bpv=0 case)
        parts.append(np.uint64(d[0]).tobytes())
    else:
        parts.append(_pack_bits(d, bpv_d))
    if bpv_t == 0:
        parts.append(np.uint64(t[0]).tobytes())
    else:
        parts.append(_pack_bits(t, bpv_t))
    return b"".join(parts)


def decode_full_block(payload: bytes) -> tuple[np.ndarray, np.ndarray]:
    bpv_d, bpv_t = payload[0], payload[1]
    buf = np.frombuffer(payload, dtype=np.uint8)
    off = 2
    if bpv_d == 0:
        d = np.full(BLOCK_SIZE, np.frombuffer(payload, np.uint64, 1, 2)[0],
                    dtype=np.uint64)
        off += 8
    else:
        nb = (BLOCK_SIZE * bpv_d + 7) // 8
        d = _unpack_bits(buf[off : off + nb], BLOCK_SIZE, bpv_d)
        off += nb
    if bpv_t == 0:
        t = np.full(BLOCK_SIZE, np.frombuffer(payload, np.uint64, 1, off)[0],
                    dtype=np.uint64)
    else:
        nb = (BLOCK_SIZE * bpv_t + 7) // 8
        t = _unpack_bits(buf[off : off + nb], BLOCK_SIZE, bpv_t)
    return d, t + 1


def encode_tail_block(deltas: np.ndarray, tfs: np.ndarray) -> bytes:
    """VByte tail (<128 entries) with Lucene's (delta<<1)|1 freq==1 trick
    (Lucene50PostingsWriter.java:330-350)."""
    stream: list[int] = []
    for delta, tf in zip(deltas.tolist(), tfs.tolist()):
        if tf == 1:
            stream.append((delta << 1) | 1)
        else:
            stream.append(delta << 1)
            stream.append(tf)
    return vbyte_encode(np.array(stream, dtype=np.uint64))


def decode_tail_block(payload: bytes, count: int) -> tuple[np.ndarray, np.ndarray]:
    # Worst case 2 values per entry; decode enough then walk.
    raw = np.frombuffer(payload, dtype=np.uint8)
    n_vals = int(((raw & 0x80) == 0).sum())
    vals = vbyte_decode(payload, n_vals)
    deltas = np.zeros(count, dtype=np.uint64)
    tfs = np.zeros(count, dtype=np.uint64)
    i = j = 0
    vl = vals.tolist()
    while j < count:
        v = vl[i]
        i += 1
        if v & 1:
            deltas[j] = v >> 1
            tfs[j] = 1
        else:
            deltas[j] = v >> 1
            tfs[j] = vl[i]
            i += 1
        j += 1
    return deltas, tfs


# ------------------------------------------------------- posting lists


def encode_blocks(doc_ids: np.ndarray, tfs: np.ndarray):
    """Split one sorted posting list into encoded blocks.

    Yields dicts per block: block_id, first_doc, last_doc, doc_count,
    payload(bytes), max_tf.  Deltas are docID gaps within the block with
    the first entry delta'd against the previous block's last doc
    (standard delta chain; block boundaries re-base on first_doc so each
    block is independently decodable given first_doc).
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    n = doc_ids.size
    out = []
    for b, start in enumerate(range(0, n, BLOCK_SIZE)):
        end = min(start + BLOCK_SIZE, n)
        docs = doc_ids[start:end]
        f = tfs[start:end]
        deltas = np.empty(docs.size, dtype=np.int64)
        deltas[0] = 0  # first doc stored in block metadata (first_doc)
        deltas[1:] = np.diff(docs)
        if docs.size == BLOCK_SIZE:
            payload = encode_full_block(deltas, f)
            kind = 0
        else:
            payload = encode_tail_block(deltas, f)
            kind = 1
        out.append(
            dict(
                block_id=b,
                kind=kind,
                first_doc=int(docs[0]),
                last_doc=int(docs[-1]),
                doc_count=int(docs.size),
                payload=payload,
                max_tf=int(f.max()),
            )
        )
    return out


def decode_block(block: dict) -> tuple[np.ndarray, np.ndarray]:
    """Decode one block dict back to (doc_ids, tfs)."""
    if block["kind"] == 0:
        deltas, tfs = decode_full_block(block["payload"])
    else:
        deltas, tfs = decode_tail_block(block["payload"], block["doc_count"])
    docs = np.cumsum(deltas.astype(np.int64)) + block["first_doc"]
    return docs, tfs.astype(np.int64)


def _batch_sections(payloads: list[bytes], offs: list[int],
                    bpvs: list[int]) -> np.ndarray:
    """Decode one field (deltas or tf-1) of MANY full blocks at once:
    group the blocks by bits-per-value, unpack each group's
    concatenated bit sections with ONE np.unpackbits + shift-sum, and
    scatter back into a (n_blocks, BLOCK_SIZE) uint64 matrix.  A full
    block's packed section is exactly BLOCK_SIZE*bpv/8 bytes
    (BLOCK_SIZE is a multiple of 8, so sections are byte-aligned and
    concatenate with no padding seams)."""
    n = len(payloads)
    out = np.empty((n, BLOCK_SIZE), dtype=np.uint64)
    groups: dict[int, list[int]] = {}
    for i, b in enumerate(bpvs):
        groups.setdefault(b, []).append(i)
    for bpv, idxs in groups.items():
        if bpv == 0:
            vals = np.frombuffer(
                b"".join(payloads[i][offs[i]:offs[i] + 8] for i in idxs),
                dtype=np.uint64,
            )
            out[idxs] = vals[:, None]
            continue
        nb = (BLOCK_SIZE * bpv) // 8
        sec = np.frombuffer(
            b"".join(payloads[i][offs[i]:offs[i] + nb] for i in idxs),
            dtype=np.uint8,
        )
        flat = np.unpackbits(sec, bitorder="little")
        bits = flat.reshape(len(idxs) * BLOCK_SIZE, bpv).astype(np.uint64)
        vals = (bits << np.arange(bpv, dtype=np.uint64)).sum(axis=1)
        out[idxs] = vals.reshape(len(idxs), BLOCK_SIZE)
    return out


def decode_full_blocks_batch(blocks: list[dict]
                             ) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized decode of MANY kind-0 (full 128-entry) blocks:
    returns (docs, tfs) flat int64 arrays of len(blocks)*BLOCK_SIZE in
    block order.  Bit-identical to per-block decode_block — the win is
    one unpackbits/reshape/cumsum pass per bpv GROUP instead of per
    block (a 10^5-posting hot term decodes in a few vectorized passes
    instead of ~10^3 python block loops)."""
    n = len(blocks)
    payloads = [b["payload"] for b in blocks]
    bpv_d = [p[0] for p in payloads]
    bpv_t = [p[1] for p in payloads]
    d_off = [2] * n
    t_off = [
        2 + (8 if bd == 0 else (BLOCK_SIZE * bd) // 8) for bd in bpv_d
    ]
    deltas = _batch_sections(payloads, d_off, bpv_d).astype(np.int64)
    tfs = _batch_sections(payloads, t_off, bpv_t).astype(np.int64) + 1
    # segmented cumsum: one global cumsum, then rebase each block to
    # its own first_doc (docs_b = cumsum(d_b) + first_b)
    flat = deltas.reshape(-1)
    cs = np.cumsum(flat)
    starts = np.arange(n, dtype=np.int64) * BLOCK_SIZE
    first = np.array([b["first_doc"] for b in blocks], dtype=np.int64)
    base = np.empty(n, dtype=np.int64)
    base[0] = first[0]
    if n > 1:
        base[1:] = first[1:] - cs[starts[1:] - 1]
    docs = cs + np.repeat(base, BLOCK_SIZE)
    return docs, tfs.reshape(-1)


def encode_positions(positions: list[np.ndarray]) -> bytes:
    """Encode per-posting position arrays (one array per posting, len=tf,
    strictly increasing within a doc) as VByte of within-doc deltas —
    the .pos file analogue (Lucene50PostingsWriter writes position deltas
    the same way).  Posting boundaries are recovered from the decoded tfs."""
    if not positions:
        return b""
    parts = []
    for p in positions:
        a = np.asarray(p, dtype=np.int64)
        d = np.empty(a.size, dtype=np.int64)
        if a.size:
            d[0] = a[0]
            d[1:] = np.diff(a)
        parts.append(d)
    return vbyte_encode(np.concatenate(parts).astype(np.uint64))


def decode_positions(payload: bytes, tfs: np.ndarray) -> list[np.ndarray]:
    """Inverse of encode_positions given the posting tfs."""
    total = int(np.asarray(tfs).sum())
    if total == 0:
        return [np.empty(0, dtype=np.int64) for _ in range(len(tfs))]
    flat = vbyte_decode(payload, total).astype(np.int64)
    out = []
    off = 0
    for tf in np.asarray(tfs, dtype=np.int64):
        seg = flat[off : off + tf]
        out.append(np.cumsum(seg))
        off += tf
    return out


def decode_posting_list(blocks: list[dict]) -> tuple[np.ndarray, np.ndarray]:
    """Decode a full posting list from its ordered blocks."""
    if not blocks:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    parts = [decode_block(b) for b in sorted(blocks, key=lambda x: x["block_id"])]
    return (
        np.concatenate([p[0] for p in parts]),
        np.concatenate([p[1] for p in parts]),
    )

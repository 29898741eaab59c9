#!/usr/bin/env python3
"""Second-implementation Kafka wire fixtures.

The Scala side (graft.kafka.Wire / MiniBroker / MiniKafkaClient) and this
script are INDEPENDENT encodings of the same public protocol definition
(https://kafka.apache.org/protocol: request/response headers, Metadata v0,
Produce v0, Fetch v0, ListOffsets v0, ApiVersions v0, MessageSet v0/v1 —
including gzip-compressed wrapper messages with KIP-31 relative offsets —
and the murmur2 default partitioner). This script writes byte-exact request
AND expected-response fixtures from the spec alone — deliberately sharing
no code with the Scala implementation — so a bug that cancels out between
the repo's own encoder and decoder (e.g. both treating a STRING length as
INT32) cannot survive the cross-check in KafkaFixtureInteropSpec.

Output: src/test/resources/kafka_wire_fixtures.txt, one `name<SP>hex`
per line. Requests are stored WITH the INT32 size prefix (ready to send),
responses WITHOUT it (compared after frame reassembly).

Regenerate with: python3 scripts/kafka_fixture_gen.py
"""
import struct
import zlib
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / \
    "src/test/resources/kafka_wire_fixtures.txt"


# ---- primitive writers (big-endian, per the protocol guide) -------------

def i8(v):
    return struct.pack(">b", v)


def i16(v):
    return struct.pack(">h", v)


def i32(v):
    return struct.pack(">i", v)


def i64(v):
    return struct.pack(">q", v)


def string(s):
    if s is None:
        return i16(-1)
    b = s.encode("utf-8")
    return i16(len(b)) + b


def nbytes(b):
    if b is None:
        return i32(-1)
    return i32(len(b)) + b


def request(api_key, corr, body, client_id="graft", api_version=0):
    payload = i16(api_key) + i16(api_version) + i32(corr) + \
        string(client_id) + body
    return i32(len(payload)) + payload


# ---- MessageSet v1 (magic 1: CRC32 over the message body) ---------------

def message_set(records):
    """records: [(offset, timestamp_ms, key_bytes_or_None, value_...)]"""
    out = b""
    for off, ts, key, value in records:
        body = i8(1) + i8(0) + i64(ts) + nbytes(key) + nbytes(value)
        crc = zlib.crc32(body) & 0xFFFFFFFF
        out += i64(off) + i32(4 + len(body)) + struct.pack(">I", crc) + body
    return out


def message_set_v0(records):
    """magic-0 entries (pre-0.10 producers): no timestamp field."""
    out = b""
    for off, _ts, key, value in records:
        body = i8(0) + i8(0) + nbytes(key) + nbytes(value)
        crc = zlib.crc32(body) & 0xFFFFFFFF
        out += i64(off) + i32(4 + len(body)) + struct.pack(">I", crc) + body
    return out


def message_set_gzip(records):
    """ONE gzip wrapper message (compression.type=gzip producer shape):
    inner v1 set with relative offsets 0..n-1, wrapper offset n-1,
    wrapper ts = max inner ts, attribute codec bits = 1, null key."""
    import gzip as _gzip
    inner = message_set([(i, ts, k, v)
                         for i, (_o, ts, k, v) in enumerate(records)])
    gz = _gzip.compress(inner, mtime=0)  # mtime=0: byte-stable fixture
    body = i8(1) + i8(1) + i64(max(ts for _o, ts, _k, _v in records)) + \
        nbytes(None) + nbytes(gz)
    crc = zlib.crc32(body) & 0xFFFFFFFF
    return i64(len(records) - 1) + i32(4 + len(body)) + \
        struct.pack(">I", crc) + body


# ---- snappy (raw block + xerial framing), from the public format doc ----

def snappy_raw_compress(data):
    """Greedy raw-snappy encoder: literals + copy-2 elements (16-bit
    offsets), so fixtures exercise the decoder's REAL copy path, not just
    literals. Independent of the Scala side by construction."""
    out = bytearray()
    v = len(data)
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)

    def emit_literal(lo, hi):
        n = hi - lo
        while n > 0:
            chunk = min(n, 60)
            out.append((chunk - 1) << 2)
            out.extend(data[lo:lo + chunk])
            lo += chunk
            n -= chunk
    table = {}
    lit_start = 0
    i = 0
    while i + 4 <= len(data):
        key = bytes(data[i:i + 4])
        j = table.get(key, -1)
        table[key] = i
        if j >= 0 and i - j <= 0xFFFF:
            length = 4
            while (i + length < len(data) and length < 64
                   and data[j + length] == data[i + length]):
                length += 1
            emit_literal(lit_start, i)
            off = i - j
            out.append(((length - 1) << 2) | 2)   # copy-2 tag
            out.append(off & 0xFF)
            out.append(off >> 8)
            i += length
            lit_start = i
        else:
            i += 1
    emit_literal(lit_start, len(data))
    return bytes(out)


def snappy_xerial(data):
    """xerial SnappyOutputStream framing (what a compression.type=snappy
    producer ships): magic, two version ints, then (len, block)*."""
    out = bytearray(b"\x82SNAPPY\x00" + i32(1) + i32(1))
    p = 0
    while True:
        block = snappy_raw_compress(data[p:p + 32768])
        out += i32(len(block)) + block
        p += 32768
        if p >= len(data):
            break
    return bytes(out)


def message_set_snappy(records):
    """ONE snappy wrapper message (codec bits = 2), KIP-31 relative
    offsets, xerial-framed value."""
    inner = message_set([(i, ts, k, v)
                         for i, (_o, ts, k, v) in enumerate(records)])
    sn = snappy_xerial(inner)
    body = i8(1) + i8(2) + i64(max(ts for _o, ts, _k, _v in records)) + \
        nbytes(None) + nbytes(sn)
    crc = zlib.crc32(body) & 0xFFFFFFFF
    return i64(len(records) - 1) + i32(4 + len(body)) + \
        struct.pack(">I", crc) + body


# ---- xxHash32 + LZ4 (block + frame), from the public specs --------------

def xxh32(data, seed=0):
    M = 0xFFFFFFFF
    P1, P2, P3, P4, P5 = 2654435761, 2246822519, 3266489917, 668265263, 374761393

    def rotl(x, r):
        return ((x << r) | (x >> (32 - r))) & M

    def le32(i):
        return int.from_bytes(data[i:i + 4], "little")
    i = 0
    n = len(data)
    if n >= 16:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while i <= n - 16:
            v1 = (rotl((v1 + le32(i) * P2) & M, 13) * P1) & M
            v2 = (rotl((v2 + le32(i + 4) * P2) & M, 13) * P1) & M
            v3 = (rotl((v3 + le32(i + 8) * P2) & M, 13) * P1) & M
            v4 = (rotl((v4 + le32(i + 12) * P2) & M, 13) * P1) & M
            i += 16
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i <= n - 4:
        h = (rotl((h + le32(i) * P3) & M, 17) * P4) & M
        i += 4
    while i < n:
        h = (rotl((h + data[i] * P5) & M, 11) * P1) & M
        i += 1
    h ^= h >> 15
    h = (h * P2) & M
    h ^= h >> 13
    h = (h * P3) & M
    h ^= h >> 16
    return h


def lz4_block_compress(data):
    """Greedy LZ4 block encoder with real matches (16-bit offsets); the
    spec's end-of-block rules (final sequence literals-only, no match
    into the last bytes) are respected."""
    out = bytearray()
    table = {}
    anchor = 0
    i = 0

    def lens(n):
        b = bytearray()
        n -= 15
        while n >= 255:
            b.append(255)
            n -= 255
        b.append(n)
        return bytes(b)
    limit = len(data) - 12
    while i < limit and i + 4 <= len(data):
        key = bytes(data[i:i + 4])
        j = table.get(key, -1)
        table[key] = i
        if j >= 0 and i - j <= 0xFFFF:
            length = 4
            while (i + length < len(data) - 5
                   and data[j + length] == data[i + length]):
                length += 1
            lit = data[anchor:i]
            ll = len(lit)
            ml = length - 4
            out.append((min(ll, 15) << 4) | min(ml, 15))
            if ll >= 15:
                out += lens(ll)
            out += lit
            off = i - j
            out.append(off & 0xFF)
            out.append(off >> 8)
            if ml >= 15:
                out += lens(ml)
            i += length
            anchor = i
        else:
            i += 1
    lit = data[anchor:]
    ll = len(lit)
    out.append(min(ll, 15) << 4)
    if ll >= 15:
        out += lens(ll)
    out += lit
    return bytes(out)


def lz4_frame(data, legacy_hc=False):
    """LZ4 FRAME: magic, FLG/BD descriptor, xxh32 header checksum,
    compressed blocks, end mark, content checksum. legacy_hc=True emits
    the KAFKA-3160 broken header checksum (computed over magic +
    descriptor) that pre-0.10 clients shipped."""
    flg = (1 << 6) | (1 << 5) | (1 << 2)   # v01, block-independent, content checksum
    bd = 4 << 4                            # 64 KiB max block
    desc = bytes([flg, bd])
    magic = struct.pack("<I", 0x184D2204)
    hc_src = magic + desc if legacy_hc else desc
    hc = (xxh32(hc_src) >> 8) & 0xFF
    out = bytearray(magic + desc + bytes([hc]))
    p = 0
    while True:
        block = lz4_block_compress(data[p:p + 65536])
        out += struct.pack("<I", len(block)) + block
        p += 65536
        if p >= len(data):
            break
    out += struct.pack("<I", 0)
    out += struct.pack("<I", xxh32(data))
    return bytes(out)


def message_set_lz4(records, legacy_hc=False):
    """ONE lz4 wrapper message (codec bits = 3), KIP-31 relative offsets,
    frame-format value."""
    inner = message_set([(i, ts, k, v)
                         for i, (_o, ts, k, v) in enumerate(records)])
    fz = lz4_frame(inner, legacy_hc=legacy_hc)
    body = i8(1) + i8(3) + i64(max(ts for _o, ts, _k, _v in records)) + \
        nbytes(None) + nbytes(fz)
    crc = zlib.crc32(body) & 0xFFFFFFFF
    return i64(len(records) - 1) + i32(4 + len(body)) + \
        struct.pack(">I", crc) + body


# ---- v2 RecordBatch (KIP-98 "magic 2", what 0.11+ clients ship) ---------

def crc32c(data):
    """CRC32C (Castagnoli), bitwise from the polynomial — independent of
    the JVM's java.util.zip.CRC32C."""
    crc = 0xFFFFFFFF
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ (0x82F63B78 if crc & 1 else 0)
    return (crc ^ 0xFFFFFFFF) & 0xFFFFFFFF


def vlong(v):
    """Zigzag varint (the protocol's varint/varlong)."""
    u = ((v << 1) ^ (v >> 63)) & 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while u & ~0x7F:
        out.append((u & 0x7F) | 0x80)
        u >>= 7
    out.append(u)
    return bytes(out)


def vbytes(b):
    if b is None:
        return vlong(-1)
    return vlong(len(b)) + b


def v2_record(offset_delta, ts_delta, key, value, headers=()):
    body = b"\x00" + vlong(ts_delta) + vlong(offset_delta) + \
        vbytes(key) + vbytes(value) + vlong(len(headers))
    for hk, hv in headers:
        body += vlong(len(hk)) + hk + vbytes(hv)
    return vlong(len(body)) + body


def record_batch_v2(records, codec=0, base_offset=0, control=False,
                    headers_on_first=()):
    """records: [(ts_ms, key, value)]; offsets dense from base_offset."""
    base_ts = min(ts for ts, _k, _v in records)
    max_ts = max(ts for ts, _k, _v in records)
    recs = b"".join(
        v2_record(i, ts - base_ts, k, v,
                  headers_on_first if i == 0 else ())
        for i, (ts, k, v) in enumerate(records))
    if codec == 1:
        import gzip as _gzip
        recs = _gzip.compress(recs, mtime=0)
    elif codec == 2:
        recs = snappy_xerial(recs)
    elif codec == 3:
        recs = lz4_frame(recs)
    attributes = codec | (0x20 if control else 0)
    covered = i16(attributes) + i32(len(records) - 1) + i64(base_ts) + \
        i64(max_ts) + i64(-1) + i16(-1) + i32(-1) + i32(len(records)) + recs
    batch_len = 4 + 1 + 4 + len(covered)
    return i64(base_offset) + i32(batch_len) + i32(-1) + b"\x02" + \
        struct.pack(">I", crc32c(covered)) + covered


# the shared v2 fixture records (restated in KafkaFixtureInteropSpec)
V2_RECORDS = [
    (5000, b"vk1", b"vv1"),
    (5001, None, b"vv2"),
    (5002, b"vk3", None),
]


# ---- murmur2 (seed 0x9747b28c), the default-partitioner hash ------------

def murmur2(data):
    M32 = 0xFFFFFFFF

    def mul(a, b):
        return (a * b) & M32
    length = len(data)
    seed = 0x9747B28C
    m = 0x5BD1E995
    r = 24
    h = (seed ^ length) & M32
    n4 = length // 4 * 4
    for i in range(0, n4, 4):
        k = data[i] | (data[i + 1] << 8) | (data[i + 2] << 16) | \
            (data[i + 3] << 24)
        k = mul(k, m)
        k ^= k >> r
        k = mul(k, m)
        h = mul(h, m)
        h ^= k
    rem = length - n4
    if rem == 3:
        h ^= (data[n4 + 2] & 0xFF) << 16
    if rem >= 2:
        h ^= (data[n4 + 1] & 0xFF) << 8
    if rem >= 1:
        h ^= data[n4] & 0xFF
        h = mul(h, m)
    h &= M32
    h ^= h >> 13
    h = mul(h, m)
    h ^= h >> 15
    return h & M32


def to_signed32(v):
    return v - (1 << 32) if v >= (1 << 31) else v


# ---- the scripted session (fresh 2-partition broker, one connection) ----

TOPIC = "fx"
RECORDS = [  # producer side writes offset 0; broker assigns 0,1,2
    (0, 1000, b"k1", b"v1"),
    (0, 1001, None, b"v2"),
    (0, 1002, b"k3", None),
]
ASSIGNED = [(i, ts, k, v) for i, (_, ts, k, v) in enumerate(RECORDS)]

fx = {}

# 1. ApiVersions (corr 1)
fx["apiversions_req"] = request(18, 1, b"")
fx["apiversions_resp"] = i32(1) + i16(0) + i32(5) + b"".join(
    i16(k) + i16(0) + i16(0) for k in (0, 1, 2, 3, 18))

# 2. Metadata v0 for [fx] (corr 2) — auto-creates the topic (2 partitions)
fx["metadata_req"] = request(3, 2, i32(1) + string(TOPIC))
# response: the broker's ephemeral port is the ONLY non-deterministic
# field; the spec compares around a 4-byte hole at this payload offset
port_hole = 4 + 4 + 4 + 2 + len(b"localhost")   # corr, n_brokers, node_id, strlen, "localhost"
fx["metadata_resp"] = (
    i32(2) + i32(1) + i32(0) + string("localhost") + i32(0)  # port zeroed
    + i32(1) + i16(0) + string(TOPIC) + i32(2)
    + b"".join(i16(0) + i32(p) + i32(0) + i32(1) + i32(0) + i32(1) + i32(0)
               for p in (0, 1)))
fx["metadata_resp_port_hole"] = i32(port_hole)  # 4 bytes, uniform hex handling

# 3. Produce v0 (corr 3): acks=1, timeout 10000, topic fx, partition 0
produce_body = i16(1) + i32(10000) + i32(1) + string(TOPIC) + \
    i32(1) + i32(0) + nbytes(message_set(RECORDS))
fx["produce_req"] = request(0, 3, produce_body)
fx["produce_resp"] = i32(3) + i32(1) + string(TOPIC) + i32(1) + \
    i32(0) + i16(0) + i64(0)

# 4. Fetch v0 (corr 4): replica -1, max_wait 0, min_bytes 0, part 0 from 0
fetch_body = i32(-1) + i32(0) + i32(0) + i32(1) + string(TOPIC) + \
    i32(1) + i32(0) + i64(0) + i32(4 << 20)
fx["fetch_req"] = request(1, 4, fetch_body)
fx["fetch_resp"] = i32(4) + i32(1) + string(TOPIC) + i32(1) + \
    i32(0) + i16(0) + i64(3) + nbytes(message_set(ASSIGNED))

# 5. ListOffsets v0 (corr 5): p0 latest (-1), p1 earliest (-2)
lo_body = i32(-1) + i32(1) + string(TOPIC) + i32(2) + \
    i32(0) + i64(-1) + i32(1) + \
    i32(1) + i64(-2) + i32(1)
fx["listoffsets_req"] = request(2, 5, lo_body)
fx["listoffsets_resp"] = i32(5) + i32(1) + string(TOPIC) + i32(2) + \
    i32(0) + i16(0) + i32(1) + i64(3) + \
    i32(1) + i16(0) + i32(1) + i64(0)

# 6. Produce v0 request carrying a GZIP-compressed batch (corr 6):
# the compression.type=gzip producer shape — the broker must unwrap the
# wrapper, resolve relative offsets, and append at base 3 (after step 3)
GZ_RECORDS = [
    (0, 2000, b"gk1", b"gv1"),
    (0, 2001, None, b"gv2"),
    (0, 2002, b"gk3", b"gv3"),
]
GZ_ASSIGNED = [(3 + i, ts, k, v) for i, (_o, ts, k, v) in enumerate(GZ_RECORDS)]
produce_gzip_body = i16(1) + i32(10000) + i32(1) + string(TOPIC) + \
    i32(1) + i32(0) + nbytes(message_set_gzip(GZ_RECORDS))
fx["produce_gzip_req"] = request(0, 6, produce_gzip_body)
fx["produce_gzip_resp"] = i32(6) + i32(1) + string(TOPIC) + i32(1) + \
    i32(0) + i16(0) + i64(3)

# 7. Fetch v0 from offset 3 (corr 7): the broker stores the gzip batch
# DECOMPRESSED (compression.type=uncompressed broker semantics), so the
# fetch returns plain magic-1 messages with the producer timestamps
fetch_gzip_body = i32(-1) + i32(0) + i32(0) + i32(1) + string(TOPIC) + \
    i32(1) + i32(0) + i64(3) + i32(4 << 20)
fx["fetch_gzip_req"] = request(1, 7, fetch_gzip_body)
fx["fetch_gzip_resp"] = i32(7) + i32(1) + string(TOPIC) + i32(1) + \
    i32(0) + i16(0) + i64(6) + nbytes(message_set(GZ_ASSIGNED))

# 8. Produce v0 request with MAGIC-0 messages (corr 8): the pre-0.10
# client shape — no timestamp field; the broker accepts and stores
# ts = -1. Partition 1 (still empty), so base = 0
V0_RECORDS = [
    (0, None, b"ok1", b"ov1"),
    (0, None, None, b"ov2"),
]
produce_v0_body = i16(1) + i32(10000) + i32(1) + string(TOPIC) + \
    i32(1) + i32(1) + nbytes(message_set_v0(V0_RECORDS))
fx["produce_v0_req"] = request(0, 8, produce_v0_body)
fx["produce_v0_resp"] = i32(8) + i32(1) + string(TOPIC) + i32(1) + \
    i32(1) + i16(0) + i64(0)

# 9. Fetch v0 of partition 1 (corr 9): up-converted magic-1 messages
# with ts = -1 (Kafka's "no timestamp" sentinel)
fetch_v0_body = i32(-1) + i32(0) + i32(0) + i32(1) + string(TOPIC) + \
    i32(1) + i32(1) + i64(0) + i32(4 << 20)
fx["fetch_v0_req"] = request(1, 9, fetch_v0_body)
fx["fetch_v0_resp"] = i32(9) + i32(1) + string(TOPIC) + i32(1) + \
    i32(1) + i16(0) + i64(2) + nbytes(message_set(
        [(i, -1, k, v) for i, (_o, _t, k, v) in enumerate(V0_RECORDS)]))

# 10. Produce v0 request carrying a SNAPPY batch (corr 10): xerial-framed
# wrapper with REAL copy elements (the repeated key/value prefixes give
# the greedy matcher 16-bit-offset copies). Appends at base 6 on p0
SN_RECORDS = [
    (0, 3000, b"snappy-key-1", b"snappy-value-aaaaaaaa"),
    (0, 3001, b"snappy-key-2", b"snappy-value-aaaaaaaa"),
    (0, 3002, b"snappy-key-3", b"snappy-value-bbbbbbbb"),
]
SN_ASSIGNED = [(6 + i, ts, k, v) for i, (_o, ts, k, v) in enumerate(SN_RECORDS)]
produce_snappy_body = i16(1) + i32(10000) + i32(1) + string(TOPIC) + \
    i32(1) + i32(0) + nbytes(message_set_snappy(SN_RECORDS))
fx["produce_snappy_req"] = request(0, 10, produce_snappy_body)
fx["produce_snappy_resp"] = i32(10) + i32(1) + string(TOPIC) + i32(1) + \
    i32(0) + i16(0) + i64(6)

# 11. Fetch v0 from offset 6 (corr 11): stored decompressed
fetch_snappy_body = i32(-1) + i32(0) + i32(0) + i32(1) + string(TOPIC) + \
    i32(1) + i32(0) + i64(6) + i32(4 << 20)
fx["fetch_snappy_req"] = request(1, 11, fetch_snappy_body)
fx["fetch_snappy_resp"] = i32(11) + i32(1) + string(TOPIC) + i32(1) + \
    i32(0) + i16(0) + i64(9) + nbytes(message_set(SN_ASSIGNED))

# 12. Produce v0 request carrying an LZ4 batch (corr 12): frame format
# with spec header checksum. Appends at base 9 on p0
LZ_RECORDS = [
    (0, 4000, b"lz4-key-1", b"lz4-value-cccccccc"),
    (0, 4001, b"lz4-key-2", b"lz4-value-cccccccc"),
    (0, 4002, None, b"lz4-value-dddddddd"),
]
LZ_ASSIGNED = [(9 + i, ts, k, v) for i, (_o, ts, k, v) in enumerate(LZ_RECORDS)]
produce_lz4_body = i16(1) + i32(10000) + i32(1) + string(TOPIC) + \
    i32(1) + i32(0) + nbytes(message_set_lz4(LZ_RECORDS))
fx["produce_lz4_req"] = request(0, 12, produce_lz4_body)
fx["produce_lz4_resp"] = i32(12) + i32(1) + string(TOPIC) + i32(1) + \
    i32(0) + i16(0) + i64(9)

# 13. Fetch v0 from offset 9 (corr 13)
fetch_lz4_body = i32(-1) + i32(0) + i32(0) + i32(1) + string(TOPIC) + \
    i32(1) + i32(0) + i64(9) + i32(4 << 20)
fx["fetch_lz4_req"] = request(1, 13, fetch_lz4_body)
fx["fetch_lz4_resp"] = i32(13) + i32(1) + string(TOPIC) + i32(1) + \
    i32(0) + i16(0) + i64(12) + nbytes(message_set(LZ_ASSIGNED))

# ---- standalone codec fixtures (unit-level cross-checks) ----------------

# plaintext with strong repetition → both greedy matchers emit copies
CODEC_PLAIN = (b"the quick brown fox jumps over the lazy dog; " * 20 +
               b"0123456789abcdef" * 32)
fx["codec_plain"] = CODEC_PLAIN
fx["snappy_raw_fx"] = snappy_raw_compress(CODEC_PLAIN)
fx["snappy_xerial_fx"] = snappy_xerial(CODEC_PLAIN)
fx["lz4_frame_fx"] = lz4_frame(CODEC_PLAIN)
# KAFKA-3160 legacy header checksum (magic included) — must still decode
fx["lz4_frame_legacy_fx"] = lz4_frame(CODEC_PLAIN, legacy_hc=True)

# ---- v2 RecordBatch fixtures (standalone; see record_batch_v2) ----------
fx["v2_plain"] = record_batch_v2(V2_RECORDS)
fx["v2_gzip"] = record_batch_v2(V2_RECORDS, codec=1)
fx["v2_snappy"] = record_batch_v2(V2_RECORDS, codec=2)
fx["v2_lz4"] = record_batch_v2(V2_RECORDS, codec=3)
fx["v2_headers"] = record_batch_v2(
    V2_RECORDS, headers_on_first=((b"h1", b"hv"), (b"h2", None)))
# a transaction-marker control batch: decoders must skip it wholesale
fx["v2_control"] = record_batch_v2(
    [(5000, struct.pack(">hh", 0, 0), b"")], control=True)
# a broker-log-shaped buffer interleaving all three entry formats
fx["v2_interleaved"] = (
    message_set([(0, 1000, b"k1", b"v1")]) +
    record_batch_v2([(5000, b"vk1", b"vv1"), (5001, None, b"vv2")],
                    base_offset=1) +
    message_set_v0([(3, None, b"ok", b"ov")]))

# ---- client-side fixtures (MiniKafkaClient's FIRST call => corr 1) ------

fx["client_produce_req"] = request(0, 1, produce_body)
fx["client_produce_resp"] = i32(1) + i32(1) + string(TOPIC) + i32(1) + \
    i32(0) + i16(0) + i64(0)
# fetch is the scripted client's SECOND call on the connection => corr 2
fx["client_fetch_req"] = request(1, 2, fetch_body)
fx["client_fetch_resp"] = i32(2) + i32(1) + string(TOPIC) + i32(1) + \
    i32(0) + i16(0) + i64(3) + nbytes(message_set(ASSIGNED))

# ---- murmur2 / partitioner expectations ---------------------------------

for key in ("k1", "k3", "user-42", "a", "abcd", "abcde", ""):
    h = murmur2(key.encode("utf-8"))
    part = (h & 0x7FFFFFFF) % 2
    fx[f"murmur2_{key or 'empty'}"] = i32(to_signed32(h)) + i32(part)

# --------------------------------------------------------------------------

OUT.parent.mkdir(parents=True, exist_ok=True)
with OUT.open("w") as f:
    for name in sorted(fx):
        f.write(f"{name} {fx[name].hex()}\n")
print(f"wrote {len(fx)} fixtures to {OUT}")

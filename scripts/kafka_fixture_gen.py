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

#!/usr/bin/env python3
"""Reference-implementation zstd fixtures for graft.kafka.Zstd.

The Scala decoder is written from RFC 8878 alone; these fixtures come
from the REFERENCE implementation (the `zstd` CLI, upstream Zstandard),
so decode is cross-checked against the format's defining implementation
rather than self-checked. Payloads are deterministic (fixed seed / fixed
text), so the fixture file is reproducible up to the CLI version noted
in the first line.

Output: src/test/resources/zstd_fixtures.txt, lines of
`name level payload_hex frame_hex`. Regenerate:
python3 scripts/zstd_fixture_gen.py [path-to-zstd]
"""
import subprocess
import sys
from pathlib import Path

ZSTD = sys.argv[1] if len(sys.argv) > 1 else "/root/miniconda/bin/zstd"
OUT = Path(__file__).resolve().parent.parent / \
    "src/test/resources/zstd_fixtures.txt"


def rng(seed):
    # deterministic xorshift so payloads do not depend on Python's RNG
    x = seed & 0xFFFFFFFFFFFFFFFF
    while True:
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
        yield x


def rand_bytes(seed, n):
    g = rng(seed)
    out = bytearray()
    while len(out) < n:
        out += next(g).to_bytes(8, "little")
    return bytes(out[:n])


def words_text(seed, n_words):
    vocab = ("the quick brown fox jumps over lazy dog stream table join "
             "hash merge sort window batch spark value key row scan fast "
             "slow part line a").split()
    g = rng(seed)
    return " ".join(vocab[next(g) % len(vocab)] for _ in range(n_words)) \
        .encode()


PAYLOADS = {
    # empty + tiny: header/edge paths
    "empty": b"",
    "one_byte": b"A",
    "tiny": b"hello world",
    # pure run: RLE literals / RLE blocks
    "run_4k": b"z" * 4096,
    "run_200k": b"q" * 200_000,  # multi-block RLE
    # compressible text: Huffman + FSE sequences (1-stream and 4-stream)
    "text_200": words_text(1, 40),
    "text_5k": words_text(2, 1000),
    "text_100k": words_text(3, 20_000),
    # > 128 KiB regenerated: multiple compressed blocks, repeat tables,
    # treeless literals at higher levels
    "text_200k": words_text(4, 40_000),
    # incompressible: raw blocks
    "random_1k": rand_bytes(5, 1024),
    "random_140k": rand_bytes(6, 140_000),
    # half-compressible: mixed block types in one frame
    "mixed": rand_bytes(7, 40_000) + words_text(8, 8_000) + b"x" * 40_000,
}

LEVELS = [1, 3, 19]


def compress(payload, level, extra=()):
    return subprocess.run(
        [ZSTD, f"-{level}", "-c", *extra],
        input=payload, capture_output=True, check=True).stdout


lines = [f"# zstd CLI fixtures; generator: {ZSTD} "
         + subprocess.run([ZSTD, "--version"], capture_output=True)
         .stdout.decode().strip()]
# payloads once (P lines), frames per level (F lines referencing them)
for name, payload in sorted(PAYLOADS.items()):
    lines.append(f"P {name} {payload.hex()}")
for name, payload in sorted(PAYLOADS.items()):
    for level in LEVELS:
        lines.append(f"F {name} {level} {compress(payload, level).hex()}")
# no-checksum variant (Content_Checksum_flag = 0 path)
lines.append("F text_5k nock3 "
             + compress(PAYLOADS["text_5k"], 3, ["--no-check"]).hex())
# long-distance matching (window descriptor variants)
lines.append("F text_200k ldm19 "
             + compress(PAYLOADS["text_200k"], 19, ["--long=20"]).hex())

OUT.parent.mkdir(parents=True, exist_ok=True)
OUT.write_text("\n".join(lines) + "\n")
print(f"wrote {len(lines) - 1} zstd fixtures to {OUT}")

"""Bit-exact Gorilla stream codec — fresh Python implementation of the
format the reference library defines (SURVEY.md §2.1 #4-#12).

Format spec (documented from reference behavior; no code ported):

Timestamps (``src/timestamp_stream.rs:29-67``):
- first record: 14-bit unsigned delta from a 2-hour-aligned header time
  (delta must be in [0, 2^14]);
- then delta-of-delta buckets: ``0`` if dod == 0; ``10`` + 7 bits
  (dod+63) for dod in [-63, 64]; ``110`` + 9 bits (dod+255) for
  [-255, 256]; ``1110`` + 12 bits (dod+2047) for [-2047, 2048]; else
  ``1111`` + the low 32 bits of dod (two's-complement truncation).
  DOCUMENTED DIVERGENCE: the reference decodes the 32-bit case as
  *unsigned* (``timestamp_stream.rs:100-103`` — bias 0), so a negative
  dod beyond -2047 garbles its own stream (hit whenever the 2-h header
  gap minus the cadence exceeds 2047 s). We sign-extend on decode —
  bit format identical, every reference golden vector (all with
  non-negative 32-bit dods) still matches, and the stream round-trips;
- decode uses wrapping 64-bit adds (``timestamp_stream.rs:88,106``), so
  negative deltas (equal/duplicate timestamps) round-trip.

Doubles (``src/double_stream.rs:33-82``, the shrinking-window
``[XORORLEADING]`` variant):
- first record: raw 64 IEEE-754 bits;
- xor == 0 → ``0`` (1 bit); writer state's xor becomes 0, which forces
  the next non-repeat to open a new window (lz(0)=64 window is
  unsatisfiable);
- window reuse (``10``): if lz(xor) [capped at 31, ``[LEADING31]``]
  >= lz(prev_xor) and tz(xor) >= tz(prev_xor), write the xor shifted by
  prev_tz in (64 - prev_lz - prev_tz) bits;
- new window (``11``): 5 bits lz (capped 31) + 6 bits (meaningful-1,
  ``[MEANING64]``) + meaningful bits, meaningful = 64 - tz - capped_lz.

Compound stream (``src/time_and_value_stream.rs:20-23``): one timestamp
record then one value record per point, interleaved.

Bit order: first-written bit is the MSB of the first byte (matches the
reference's golden bit-string tests, which are asserted verbatim in
tests/test_gorilla_codec.py).

Everything in this module is deliberately self-contained (stdlib only)
so Spark executors can receive it pickled by value.
"""

from __future__ import annotations

import struct

_U64 = (1 << 64) - 1


class BitWriter:
    """Append-only bit sink; O(1) amortized per write."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0
        self.nbits = 0

    def write(self, value: int, count: int) -> None:
        """Append the ``count`` least-significant bits of ``value``,
        most-significant of those first (Writer contract, stream.rs:1-4)."""
        self.acc = (self.acc << count) | (value & ((1 << count) - 1))
        self.nacc += count
        self.nbits += count
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def getvalue(self) -> tuple[bytes, int]:
        """(payload, total bit count); trailing partial byte zero-padded."""
        out = bytes(self.buf)
        if self.nacc:
            out += bytes([(self.acc << (8 - self.nacc)) & 0xFF])
        return out, self.nbits

    @property
    def bit_string(self) -> str:
        data, nbits = self.getvalue()
        return "".join(f"{b:08b}" for b in data)[:nbits]


class BitReader:
    """Forward-only bit cursor; returns None at end-of-stream
    (Reader contract, stream.rs:6-8)."""

    def __init__(self, data: bytes, nbits: int) -> None:
        self.data = data
        self.nbits = nbits
        self.pos = 0

    def read(self, count: int) -> int | None:
        if self.pos + count > self.nbits:
            return None
        out = 0
        pos = self.pos
        remaining = count
        while remaining:
            byte = self.data[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, remaining)
            chunk = (byte >> (avail - take)) & ((1 << take) - 1)
            out = (out << take) | chunk
            pos += take
            remaining -= take
        self.pos = pos
        return out


def _lz64(x: int) -> int:
    return 64 - x.bit_length() if x else 64


def _tz64(x: int) -> int:
    return (x & -x).bit_length() - 1 if x else 0


class TimestampEncoder:
    def __init__(self, header_time: int) -> None:
        self.header_time = header_time
        self.prev: int | None = None
        self.delta = 0

    def push(self, ts: int, w: BitWriter) -> None:
        if self.prev is None:
            delta = ts - self.header_time
            if not (0 <= delta <= (1 << 14)):
                raise ValueError(
                    f"first delta {delta} outside [0, 2^14] — header_time "
                    "must be the 2h-aligned floor of the first timestamp"
                )
            w.write(delta, 14)
            self.delta = delta
        else:
            delta = ts - self.prev  # may be negative (dupes ok)
            dod = delta - self.delta
            if dod == 0:
                w.write(0, 1)
            elif -63 <= dod <= 64:
                w.write(0b10, 2)
                w.write(dod + 63, 7)
            elif -255 <= dod <= 256:
                w.write(0b110, 3)
                w.write(dod + 255, 9)
            elif -2047 <= dod <= 2048:
                w.write(0b1110, 4)
                w.write(dod + 2047, 12)
            else:
                w.write(0b1111, 4)
                w.write(dod & 0xFFFFFFFF, 32)
            self.delta = delta
        self.prev = ts


class TimestampDecoder:
    def __init__(self, header_time: int) -> None:
        self.header_time = header_time
        self.value: int | None = None
        self.delta = 0

    def next(self, r: BitReader) -> int | None:
        if self.value is None:
            delta = r.read(14)
            if delta is None:
                return None
            self.value = (self.header_time + delta) & _U64
            self.delta = delta
            return self.value
        ctl = r.read(1)
        if ctl is None:
            return None
        if ctl == 0:
            self.value = (self.value + self.delta) & _U64
            return self.value
        if r.read(1) == 0:
            nbits, bias = 7, 63
        elif r.read(1) == 0:
            nbits, bias = 9, 255
        elif r.read(1) == 0:
            nbits, bias = 12, 2047
        else:
            nbits, bias = 32, 0
        dod = r.read(nbits) - bias
        if nbits == 32 and dod >= (1 << 31):  # sign-extend (see module doc)
            dod -= 1 << 32
        self.delta += dod
        self.value = (self.value + self.delta) & _U64
        return self.value


class DoubleEncoder:
    def __init__(self) -> None:
        self.value: int | None = None
        self.xor = 0

    def push(self, number: float, w: BitWriter) -> None:
        bits = struct.unpack("<Q", struct.pack("<d", number))[0]
        if self.value is None:
            w.write(bits, 64)
            self.value, self.xor = bits, bits
            return
        xored = self.value ^ bits
        if xored == 0:
            w.write(0, 1)
        else:
            lz = min(_lz64(xored), 31)
            tz = _tz64(xored)
            prev_lz = _lz64(self.xor)
            prev_tz = 0 if prev_lz == 64 else _tz64(self.xor)
            if lz >= prev_lz and tz >= prev_tz:
                w.write(0b10, 2)
                w.write(xored >> prev_tz, 64 - prev_tz - prev_lz)
            else:
                meaningful = 64 - tz - lz
                w.write(0b11, 2)
                w.write(lz, 5)
                w.write(meaningful - 1, 6)
                w.write(xored >> tz, meaningful)
        self.value, self.xor = bits, xored


class DoubleDecoder:
    def __init__(self) -> None:
        self.value: int | None = None
        self.xor = 0

    def next(self, r: BitReader) -> float | None:
        if self.value is None:
            bits = r.read(64)
            if bits is None:
                return None
            self.value, self.xor = bits, bits
        else:
            ctl = r.read(1)
            if ctl is None:
                return None
            if ctl == 1:
                if r.read(1) == 0:  # reuse window (from current xor state)
                    prev_lz = _lz64(self.xor)
                    prev_tz = 0 if prev_lz == 64 else _tz64(self.xor)
                    nbits = 64 - prev_tz - prev_lz
                    new_xor = r.read(nbits) << prev_tz
                else:  # new window
                    lz = r.read(5)
                    meaningful = r.read(6) + 1
                    tz = 64 - meaningful - lz
                    new_xor = r.read(meaningful) << tz
                self.value ^= new_xor
                self.xor = new_xor
        return struct.unpack("<d", struct.pack("<Q", self.value))[0]


# ---------------------------------------------------------------------------
# Compound (ts, value) block API — time_and_value_stream.rs:20-51
# ---------------------------------------------------------------------------


def encode_block(
    timestamps: list[int], values: list[float], header_time: int
) -> tuple[bytes, int]:
    """Interleaved (timestamp record, value record) per point."""
    w = BitWriter()
    te, de = TimestampEncoder(header_time), DoubleEncoder()
    for ts, v in zip(timestamps, values):
        te.push(int(ts), w)
        de.push(float(v), w)
    return w.getvalue()


def decode_block(
    payload: bytes, nbits: int, header_time: int
) -> tuple[list[int], list[float]]:
    r = BitReader(payload, nbits)
    td, dd = TimestampDecoder(header_time), DoubleDecoder()
    out_ts: list[int] = []
    out_v: list[float] = []
    while True:
        ts = td.next(r)
        if ts is None:
            break
        v = dd.next(r)
        if v is None:
            raise ValueError("value truncated: timestamp without value")
        out_ts.append(ts)
        out_v.append(v)
    return out_ts, out_v

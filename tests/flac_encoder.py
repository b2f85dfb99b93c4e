"""Minimal FLAC *encoder* (test-only) to exercise the native C++ decoder.

Emits spec-conformant streams with STREAMINFO + frames using constant /
verbatim / fixed-predictor subframes, Rice-coded residual (partition order
0 or given), optional left/side / mid/side stereo decorrelation, and
correct CRC-8 / CRC-16 (the decoder skips CRCs, but conformance keeps this
encoder honest against other decoders too).
"""
import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, value, nbits):
        value &= (1 << nbits) - 1 if nbits < 64 else ~0
        for i in range(nbits - 1, -1, -1):
            self.cur = (self.cur << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.bytes.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def write_signed(self, value, nbits):
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q):
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def write_rice(self, value, param):
        v = (value << 1) ^ (value >> 63) if value < 0 else (value << 1)
        v = (abs(value) << 1) - (1 if value < 0 else 0)
        self.write_unary(v >> param)
        if param:
            self.write(v & ((1 << param) - 1), param)

    def align(self):
        while self.nbits:
            self.write(0, 1)

    def getvalue(self):
        assert self.nbits == 0
        return bytes(self.bytes)


def crc8(data):
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 \
                else (crc << 1) & 0xFF
    return crc


def crc16(data):
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def utf8_number(n):
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while (nbytes * 6 - 5) + 1 < bits and nbytes < 7:
        nbytes += 1
    first_payload = 7 - nbytes - 1 if nbytes < 7 else 0
    masks = {2: 0xC0, 3: 0xE0, 4: 0xF0, 5: 0xF8, 6: 0xFC, 7: 0xFE}
    shift = 6 * (nbytes - 1)
    out.append(masks[nbytes] | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _fixed_residual(x, order):
    e = np.asarray(x, dtype=np.int64)
    for _ in range(order):
        e = np.diff(e)
    return e


def _write_residual(bw, res, order, block_size, porder=0):
    bw.write(0, 2)           # rice method 0 (4-bit params)
    bw.write(porder, 4)
    nparts = 1 << porder
    part_len = block_size >> porder
    idx = 0
    for p in range(nparts):
        count = part_len - (order if p == 0 else 0)
        chunk = res[idx:idx + count]
        idx += count
        # pick a reasonable rice parameter
        mean = max(1.0, np.abs(chunk).mean() if len(chunk) else 1.0)
        param = min(14, max(0, int(np.ceil(np.log2(mean * 2)))))
        bw.write(param, 4)
        for v in chunk:
            bw.write_rice(int(v), param)


def _write_subframe(bw, x, bps, mode="auto"):
    x = np.asarray(x, dtype=np.int64)
    n = len(x)
    if mode == "auto":
        if np.all(x == x[0]):
            mode = "constant"
        else:
            mode = "fixed2"
    bw.write(0, 1)  # pad
    if mode == "constant":
        bw.write(0, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write_signed(int(x[0]), bps)
    elif mode == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for v in x:
            bw.write_signed(int(v), bps)
    elif mode.startswith("fixed"):
        order = int(mode[5:])
        bw.write(8 + order, 6)
        bw.write(0, 1)
        for v in x[:order]:
            bw.write_signed(int(v), bps)
        res = _fixed_residual(x, order)
        porder = 1 if (order == 0 and n % 2 == 0 and n >= 8) else 0
        _write_residual(bw, res, order, n, porder)
    else:
        raise ValueError(mode)


def encode_flac(samples, sr, bps=16, block_size=4096, stereo_mode="independent",
                subframe_mode="auto"):
    """samples: (N,) or (N, 2) int array. Returns FLAC bytes."""
    samples = np.asarray(samples, dtype=np.int64)
    if samples.ndim == 1:
        samples = samples[:, None]
    n_total, channels = samples.shape

    out = bytearray(b"fLaC")
    # STREAMINFO (34 bytes), last-metadata flag set
    si = BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sr, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n_total, 36)
    si_bytes = si.getvalue() + b"\x00" * 16  # md5 zeros
    out += bytes([0x80, 0, 0, len(si_bytes)]) + si_bytes

    frame_idx = 0
    for start in range(0, n_total, block_size):
        block = samples[start:start + block_size]
        bs = len(block)

        hdr = BitWriter()
        hdr.write(0x3FFE, 14)
        hdr.write(0, 1)
        hdr.write(0, 1)   # fixed blocksize strategy
        # blocksize code: use 7 (16-bit follows) for generality
        hdr.write(7, 4)
        hdr.write(0, 4)   # sample rate: from STREAMINFO
        if channels == 1:
            ch_code = 0
        elif stereo_mode == "independent":
            ch_code = 1
        elif stereo_mode == "left_side":
            ch_code = 8
        elif stereo_mode == "right_side":
            ch_code = 9
        elif stereo_mode == "mid_side":
            ch_code = 10
        else:
            raise ValueError(stereo_mode)
        hdr.write(ch_code, 4)
        hdr.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps], 3)
        hdr.write(0, 1)
        hdr.align()
        hdr_bytes = bytearray(hdr.getvalue())
        hdr_bytes += utf8_number(frame_idx)
        hdr_bytes += bytes([(bs - 1) >> 8, (bs - 1) & 0xFF])
        hdr_bytes.append(crc8(hdr_bytes))

        body = BitWriter()
        if channels == 1 or stereo_mode == "independent":
            for c in range(channels):
                _write_subframe(body, block[:, c], bps, subframe_mode)
        else:
            left = block[:, 0]
            right = block[:, 1]
            if stereo_mode == "left_side":
                _write_subframe(body, left, bps, subframe_mode)
                _write_subframe(body, left - right, bps + 1, subframe_mode)
            elif stereo_mode == "right_side":
                _write_subframe(body, left - right, bps + 1, subframe_mode)
                _write_subframe(body, right, bps, subframe_mode)
            else:  # mid_side
                side = left - right
                mid = (left + right) >> 1
                _write_subframe(body, mid, bps, subframe_mode)
                _write_subframe(body, side, bps + 1, subframe_mode)
        body.align()

        frame = bytes(hdr_bytes) + body.getvalue()
        frame += crc16(frame).to_bytes(2, "big")
        out += frame
        frame_idx += 1
    return bytes(out)

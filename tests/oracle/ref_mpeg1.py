"""Straight-line oracle MPEG-1 video decoder (test fixture ONLY).

An independent re-implementation of the reference decoder's exact integer
semantics (/root/reference/src/mpeg1.js), used as the golden output for
differential tests against the TPU pipeline.  Deliberately written in a
different style from the product code (bit-at-a-time VLC tree walks,
branchy per-case motion compensation) so shared bugs are unlikely.
"""

from __future__ import annotations

import numpy as np

from jsmpeg_tpu import tables as T

MASK32 = 0xFFFFFFFF


def i32(x: int) -> int:
    x &= MASK32
    return x - 0x100000000 if x >= 0x80000000 else x


def _tree(codes: dict) -> dict:
    root = {}
    for bits, val in codes.items():
        node = root
        for b in bits[:-1]:
            node = node.setdefault(b, {})
            assert not isinstance(node, tuple)
        assert bits[-1] not in node
        node[bits[-1]] = ('leaf', val)
    return root


_TREES = {
    'inc': _tree(T.MACROBLOCK_ADDRESS_INCREMENT),
    'type_i': _tree(T.MACROBLOCK_TYPE_I),
    'type_p': _tree(T.MACROBLOCK_TYPE_P),
    'cbp': _tree(T.CODE_BLOCK_PATTERN),
    'motion': _tree(T.MOTION),
    'dc_luma': _tree(T.DCT_DC_SIZE_LUMINANCE),
    'dc_chroma': _tree(T.DCT_DC_SIZE_CHROMINANCE),
    'coeff': _tree({**{k: (v[0] << 8) | v[1] for k, v in T.DCT_COEFF.items()},
                    T.DCT_COEFF_ESCAPE: 0xFFFF}),
}


class Bits:
    def __init__(self, data: bytes):
        self.b = np.frombuffer(bytes(data), dtype=np.uint8)
        self.n = len(self.b)
        self.i = 0   # bit index

    def read(self, count: int) -> int:
        v = 0
        for _ in range(count):
            byte = self.b[self.i >> 3] if (self.i >> 3) < self.n else 0
            v = (v << 1) | ((int(byte) >> (7 - (self.i & 7))) & 1)
            self.i += 1
        return v

    def skip(self, count: int) -> None:
        self.i += count

    def rewind(self, count: int) -> None:
        self.i = max(self.i - count, 0)

    def vlc(self, tree: dict):
        node = tree
        while True:
            bit = '1' if self.read(1) else '0'
            node = node[bit]
            if isinstance(node, tuple):
                return node[1]

    def next_bytes_are_start_code(self) -> bool:
        j = (self.i + 7) >> 3
        if j >= self.n:
            return True
        return (j + 2 < self.n and self.b[j] == 0 and self.b[j + 1] == 0
                and self.b[j + 2] == 1)

    def find_next_start_code(self) -> int:
        j = (self.i + 7) >> 3
        while j < self.n:
            if (j + 2 < self.n and self.b[j] == 0 and self.b[j + 1] == 0
                    and self.b[j + 2] == 1):
                self.i = (j + 4) << 3
                return int(self.b[j + 3]) if j + 3 < self.n else 0
            j += 1
        self.i = self.n << 3
        return -1

    def find_start_code(self, code: int) -> int:
        while True:
            c = self.find_next_start_code()
            if c == code or c == -1:
                return c


class OracleMPEG1:
    """Decode a whole elementary stream; call decode() repeatedly."""

    def __init__(self, data: bytes):
        self.bits = Bits(data)
        self.has_seq = False
        self.block_data = [0] * 64
        if self.bits.find_start_code(T.START_SEQUENCE) != -1:
            self._sequence_header()

    def _sequence_header(self):
        b = self.bits
        self.width = b.read(12)
        self.height = b.read(12)
        b.skip(4)
        self.frame_rate = T.PICTURE_RATE[b.read(4)]
        b.skip(18 + 1 + 10 + 1)
        self.intra_q = [int(v) for v in T.DEFAULT_INTRA_QUANT_MATRIX]
        self.non_intra_q = [int(v) for v in T.DEFAULT_NON_INTRA_QUANT_MATRIX]
        if b.read(1):
            m = [0] * 64
            for i in range(64):
                m[int(T.ZIG_ZAG[i])] = b.read(8)
            self.intra_q = m
        if b.read(1):
            m = [0] * 64
            for i in range(64):
                m[int(T.ZIG_ZAG[i])] = b.read(8)
            self.non_intra_q = m
        self.mb_w = (self.width + 15) >> 4
        self.mb_h = (self.height + 15) >> 4
        self.mb_size = self.mb_w * self.mb_h
        self.cw = self.mb_w << 4
        self.ch = self.mb_h << 4
        z = lambda h, w: np.zeros((h, w), dtype=np.int64)
        self.cur = {'y': z(self.ch, self.cw),
                    'cr': z(self.ch >> 1, self.cw >> 1),
                    'cb': z(self.ch >> 1, self.cw >> 1)}
        self.fwd = {'y': z(self.ch, self.cw),
                    'cr': z(self.ch >> 1, self.cw >> 1),
                    'cb': z(self.ch >> 1, self.cw >> 1)}
        self.has_seq = True

    # ------------------------------------------------------------------

    def decode(self):
        """Decode the next picture.  Returns (y, cr, cb) uint8 copies, the
        string 'skipped' for consumed-but-not-rendered pictures, or None at
        end of stream."""
        if not self.has_seq:
            return None
        if self.bits.find_start_code(T.START_PICTURE) == -1:
            return None
        return self._picture()

    def decode_all(self):
        frames = []
        while True:
            out = self.decode()
            if out is None:
                return frames
            if out != 'skipped':
                frames.append(out)

    def _picture(self):
        b = self.bits
        b.skip(10)
        self.pic_type = b.read(3)
        b.skip(16)
        if self.pic_type <= 0 or self.pic_type >= T.PIC_B:
            return 'skipped'
        if self.pic_type == T.PIC_P:
            self.full_pel = b.read(1)
            f_code = b.read(3)
            if f_code == 0:
                return 'skipped'
            self.fw_r_size = f_code - 1
            self.fw_f = 1 << self.fw_r_size

        code = b.find_next_start_code()
        while code in (T.START_EXTENSION, T.START_USER_DATA):
            code = b.find_next_start_code()
        while T.START_SLICE_FIRST <= code <= T.START_SLICE_LAST:
            self._slice(code & 0xFF)
            code = b.find_next_start_code()
        if code != -1:
            b.rewind(32)

        out = (self.cur['y'].astype(np.uint8).copy(),
               self.cur['cr'].astype(np.uint8).copy(),
               self.cur['cb'].astype(np.uint8).copy())
        if self.pic_type in (T.PIC_I, T.PIC_P):
            self.cur, self.fwd = self.fwd, self.cur
        return out

    def _slice(self, slice_no: int):
        b = self.bits
        self.slice_begin = True
        self.mb_addr = (slice_no - 1) * self.mb_w - 1
        self.mot_h = self.mot_h_prev = 0
        self.mot_v = self.mot_v_prev = 0
        self.dc_y = self.dc_cr = self.dc_cb = 128
        self.qscale = b.read(5)
        while b.read(1):
            b.skip(8)
        while True:
            self._macroblock()
            if b.next_bytes_are_start_code():
                break

    def _macroblock(self):
        b = self.bits
        increment = 0
        t = b.vlc(_TREES['inc'])
        while t == 34:
            t = b.vlc(_TREES['inc'])
        while t == 35:
            increment += 33
            t = b.vlc(_TREES['inc'])
        increment += t

        if self.slice_begin:
            self.slice_begin = False
            self.mb_addr += increment
        else:
            if self.mb_addr + increment >= self.mb_size:
                return
            if increment > 1:
                self.dc_y = self.dc_cr = self.dc_cb = 128
                if self.pic_type == T.PIC_P:
                    self.mot_h = self.mot_h_prev = 0
                    self.mot_v = self.mot_v_prev = 0
            while increment > 1:
                self.mb_addr += 1
                self.mb_row, self.mb_col = divmod(self.mb_addr, self.mb_w)
                self._copy_macroblock(self.mot_h, self.mot_v)
                increment -= 1
            self.mb_addr += 1
        self.mb_row, self.mb_col = divmod(self.mb_addr, self.mb_w)

        tree = _TREES['type_i'] if self.pic_type == T.PIC_I else _TREES['type_p']
        mb_type = b.vlc(tree)
        self.mb_intra = bool(mb_type & 0x01)
        mot_fw = bool(mb_type & 0x08)
        if mb_type & 0x10:
            self.qscale = b.read(5)

        if self.mb_intra:
            self.mot_h = self.mot_h_prev = 0
            self.mot_v = self.mot_v_prev = 0
        else:
            self.dc_y = self.dc_cr = self.dc_cb = 128
            self._motion_vectors(mot_fw)
            self._copy_macroblock(self.mot_h, self.mot_v)

        if mb_type & 0x02:
            cbp = b.vlc(_TREES['cbp'])
        else:
            cbp = 0x3F if self.mb_intra else 0

        mask = 0x20
        for block in range(6):
            if cbp & mask:
                self._block(block)
            mask >>= 1

    def _motion_vectors(self, mot_fw):
        b = self.bits
        if mot_fw:
            for axis in range(2):
                code = b.vlc(_TREES['motion'])
                if code != 0 and self.fw_f != 1:
                    r = b.read(self.fw_r_size)
                    d = ((abs(code) - 1) << self.fw_r_size) + r + 1
                    if code < 0:
                        d = -d
                else:
                    d = code
                if axis == 0:
                    p = self.mot_h_prev + d
                    if p > (self.fw_f << 4) - 1:
                        p -= self.fw_f << 5
                    elif p < -(self.fw_f << 4):
                        p += self.fw_f << 5
                    self.mot_h_prev = p
                    self.mot_h = p << 1 if self.full_pel else p
                else:
                    p = self.mot_v_prev + d
                    if p > (self.fw_f << 4) - 1:
                        p -= self.fw_f << 5
                    elif p < -(self.fw_f << 4):
                        p += self.fw_f << 5
                    self.mot_v_prev = p
                    self.mot_v = p << 1 if self.full_pel else p
        elif self.pic_type == T.PIC_P:
            self.mot_h = self.mot_h_prev = 0
            self.mot_v = self.mot_v_prev = 0

    # -------------------------------------------------- motion compensation

    def _copy_plane_block(self, src: np.ndarray, dst: np.ndarray,
                          dr: int, dc: int, size: int,
                          motion_h: int, motion_v: int):
        H = motion_h >> 1
        V = motion_v >> 1
        odd_h = (motion_h & 1) == 1
        odd_v = (motion_v & 1) == 1
        sr = dr + V
        sc = dc + H
        if odd_h and odd_v:
            a = src[sr:sr + size, sc:sc + size]
            bb = src[sr:sr + size, sc + 1:sc + size + 1]
            c = src[sr + 1:sr + size + 1, sc:sc + size]
            d = src[sr + 1:sr + size + 1, sc + 1:sc + size + 1]
            dst[dr:dr + size, dc:dc + size] = (a + bb + c + d + 2) >> 2
        elif odd_h:
            a = src[sr:sr + size, sc:sc + size]
            bb = src[sr:sr + size, sc + 1:sc + size + 1]
            dst[dr:dr + size, dc:dc + size] = (a + bb + 1) >> 1
        elif odd_v:
            a = src[sr:sr + size, sc:sc + size]
            c = src[sr + 1:sr + size + 1, sc:sc + size]
            dst[dr:dr + size, dc:dc + size] = (a + c + 1) >> 1
        else:
            dst[dr:dr + size, dc:dc + size] = src[sr:sr + size, sc:sc + size]

    def _copy_macroblock(self, motion_h: int, motion_v: int):
        self._copy_plane_block(self.fwd['y'], self.cur['y'],
                               self.mb_row << 4, self.mb_col << 4, 16,
                               motion_h, motion_v)
        mh = int(motion_h / 2)   # truncate toward zero, like JS (x/2)|0 semantics
        mv = int(motion_v / 2)
        for p in ('cr', 'cb'):
            self._copy_plane_block(self.fwd[p], self.cur[p],
                                   self.mb_row << 3, self.mb_col << 3, 8,
                                   mh, mv)

    # --------------------------------------------------------- block layer

    def _block(self, block: int):
        b = self.bits
        bd = self.block_data
        n = 0
        if self.mb_intra:
            if block < 4:
                predictor = self.dc_y
                size = b.vlc(_TREES['dc_luma'])
            else:
                predictor = self.dc_cr if block == 4 else self.dc_cb
                size = b.vlc(_TREES['dc_chroma'])
            if size > 0:
                diff = b.read(size)
                if diff & (1 << (size - 1)):
                    bd[0] = predictor + diff
                else:
                    bd[0] = predictor + (i32(-1 << size) | (diff + 1))
            else:
                bd[0] = predictor
            if block < 4:
                self.dc_y = bd[0]
            elif block == 4:
                self.dc_cr = bd[0]
            else:
                self.dc_cb = bd[0]
            bd[0] = i32(bd[0] << 8)
            quant = self.intra_q
            n = 1
        else:
            quant = self.non_intra_q

        while True:
            coeff = b.vlc(_TREES['coeff'])
            if coeff == 0x0001 and n > 0 and b.read(1) == 0:
                break
            if coeff == 0xFFFF:
                run = b.read(6)
                level = b.read(8)
                if level == 0:
                    level = b.read(8)
                elif level == 128:
                    level = b.read(8) - 256
                elif level > 128:
                    level -= 256
            else:
                run = coeff >> 8
                level = coeff & 0xFF
                if b.read(1):
                    level = -level
            n += run
            dez = int(T.ZIG_ZAG[n])
            n += 1
            level <<= 1
            if not self.mb_intra:
                level += -1 if level < 0 else 1
            level = i32(level * self.qscale * quant[dez]) >> 4
            if (level & 1) == 0:
                level -= 1 if level > 0 else -1
            level = min(max(level, -2048), 2047)
            bd[dez] = i32(level * int(T.PREMULTIPLIER_MATRIX[dez]))

        # destination
        if block < 4:
            dest = self.cur['y']
            dr = (self.mb_row << 4) + (8 if block & 2 else 0)
            dc = (self.mb_col << 4) + (8 if block & 1 else 0)
        else:
            dest = self.cur['cb'] if block == 4 else self.cur['cr']
            dr = self.mb_row << 3
            dc = self.mb_col << 3

        if n == 1:
            val = (bd[0] + 128) >> 8
            if self.mb_intra:
                dest[dr:dr + 8, dc:dc + 8] = min(max(val, 0), 255)
            else:
                dest[dr:dr + 8, dc:dc + 8] = np.clip(
                    dest[dr:dr + 8, dc:dc + 8] + val, 0, 255)
            bd[0] = 0
        else:
            blk = idct_int(np.array(bd, dtype=np.int64).reshape(8, 8))
            if self.mb_intra:
                dest[dr:dr + 8, dc:dc + 8] = np.clip(blk, 0, 255)
            else:
                dest[dr:dr + 8, dc:dc + 8] = np.clip(
                    dest[dr:dr + 8, dc:dc + 8] + blk, 0, 255)
            self.block_data = [0] * 64


def _wrap32(x: np.ndarray) -> np.ndarray:
    return ((x + 0x80000000) & MASK32) - 0x80000000


def _shr8_round(x: np.ndarray) -> np.ndarray:
    """(ToInt32(x) + 0) >> 8 on already +128'd input."""
    return _wrap32(x) >> 8


def idct_int(blk: np.ndarray) -> np.ndarray:
    """The reference's fixed-point 8x8 IDCT, columns then rows, with JS
    ToInt32 reduction applied exactly at '>>' sites and Int32Array stores."""
    out = blk.astype(np.int64)

    for axis in (0, 1):
        m = out if axis == 0 else out.T
        b1 = m[4]
        b3 = m[2] + m[6]
        b4 = m[5] - m[3]
        tmp1 = m[1] + m[7]
        tmp2 = m[3] + m[5]
        b6 = m[1] - m[7]
        b7 = tmp1 + tmp2
        m0 = m[0]
        x4 = _shr8_round(b6 * 473 - b4 * 196 + 128) - b7
        x0 = x4 - _shr8_round((tmp1 - tmp2) * 362 + 128)
        x1 = m0 - b1
        x2 = _shr8_round((m[2] - m[6]) * 362 + 128) - b3
        x3 = m0 + b1
        y3 = x1 + x2
        y4 = x3 + b3
        y5 = x1 - x2
        y6 = x3 - b3
        y7 = -x0 - _shr8_round(b4 * 473 + b6 * 196 + 128)
        if axis == 0:
            rows = [b7 + y4, x4 + y3, y5 - x0, y6 - y7,
                    y6 + y7, x0 + y5, y3 - x4, y4 - b7]
            out = _wrap32(np.stack(rows))
        else:
            rows = [_wrap32(b7 + y4 + 128) >> 8,
                    _wrap32(x4 + y3 + 128) >> 8,
                    _wrap32(y5 - x0 + 128) >> 8,
                    _wrap32(y6 - y7 + 128) >> 8,
                    _wrap32(y6 + y7 + 128) >> 8,
                    _wrap32(x0 + y5 + 128) >> 8,
                    _wrap32(y3 - x4 + 128) >> 8,
                    _wrap32(y4 - b7 + 128) >> 8]
            out = _wrap32(np.stack(rows)).T
    return out

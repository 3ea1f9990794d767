"""Minimal LCM (Lightweight Communications and Marshalling) implementation.

The reference's deployment stack talks LCM over UDP multicast
(go1_gym_deploy/envs/lcm_agent.py:10 `udpm://239.255.76.67:7667?ttl=255`,
channels at go1_gym_deploy/unitree_legged_sdk_bin/lcm_position.cpp:65,
187-189). The lcm package is an external C library; this module implements
the PUBLIC LCM wire protocol (https://lcm-proj.github.io) from scratch so
the deployment stack has no binary dependency:

- UDP short-message framing: magic 0x4C433032 ("LC02"), u32 sequence,
  NUL-terminated channel string, payload;
- payload = big-endian i64 type hash + packed big-endian fields;
- the lcm-gen type-hash algorithm so messages interoperate with real LCM
  peers (the robot-side C++ bridge in cpp/ uses the same functions).

Only short messages (< ~64 KB) are supported — every message in this stack
is < 400 bytes.
"""
from __future__ import annotations

import socket
import struct
import threading
from typing import Callable, Dict, Optional

MAGIC_SHORT = 0x4C433032
MAGIC_FRAG = 0x4C433033          # "LC03": fragmented messages (>~60 KB,
                                 # e.g. the camera image streams)
FRAG_SIZE = 60000
DEFAULT_URL = ("239.255.76.67", 7667)

_MASK = (1 << 64) - 1


def _i64(v: int) -> int:
    """Wrap to signed 64-bit."""
    v &= _MASK
    return v - (1 << 64) if v >= (1 << 63) else v


def hash_update(v: int, c: int) -> int:
    """lcm-gen hash primitive with C int64 semantics:
    v = ((v<<8) ^ (v>>55)) + c, where >> is an ARITHMETIC (sign-extending)
    shift — verified bit-exact against the fingerprints in lcm-gen'd
    bindings (e.g. pd_tau_targets base hash 0x6d88128ef1291cc1)."""
    v = _i64(v)
    left = _i64((v << 8) & _MASK)
    right = v >> 55          # python's >> on a signed int is arithmetic
    return _i64(((left ^ right) + c) & _MASK)


def hash_string_update(v: int, s: str) -> int:
    v = hash_update(v, len(s))
    for ch in s:
        v = hash_update(v, ord(ch))
    return v


def compute_hash(members) -> int:
    """Base hash of a flat struct: members = [(name, type_str, [dims])].
    Bit-exact with lcm-gen for structs of primitive types, so our encodings
    interoperate with real LCM peers (the reference's generated bindings
    under go1_gym_deploy/lcm_types/ carry the same fingerprints)."""
    v = 0x12345678
    for name, typ, dims in members:
        v = hash_string_update(v, name)
        v = hash_string_update(v, typ)
        v = hash_update(v, len(dims))
        for d in dims:
            v = hash_update(v, 0)            # LCM_CONST dimension mode
            v = hash_string_update(v, str(d))
    # no nested types: final fingerprint = rotate left by 1
    v &= _MASK
    return _i64(((v << 1) & _MASK) + (v >> 63))


_FMT = {"float": "f", "double": "d", "int16_t": "h", "int32_t": "i",
        "int64_t": "q", "int8_t": "b", "byte": "B", "boolean": "b"}


class LCMStruct:
    """Base for hand-written message classes. Subclasses define
    __members__ = [(name, type, dims)] mirroring a .lcm schema."""

    __members__ = []

    def __init__(self, **kw):
        for name, typ, dims in self.__members__:
            n = 1
            for d in dims:
                n *= d
            default = [0.0 if typ in ("float", "double") else 0] * n \
                if dims else (0.0 if typ in ("float", "double") else 0)
            setattr(self, name, kw.get(name, default))

    @classmethod
    def type_hash(cls) -> int:
        return compute_hash(cls.__members__)

    def encode(self) -> bytes:
        out = [struct.pack(">q", self.type_hash())]
        for name, typ, dims in self.__members__:
            v = getattr(self, name)
            fmt = _FMT[typ]
            if dims:
                n = 1
                for d in dims:
                    n *= d
                flat = list(v)
                assert len(flat) == n, f"{name}: expected {n} values"
                out.append(struct.pack(f">{n}{fmt}", *flat))
            else:
                out.append(struct.pack(f">{fmt}", v))
        return b"".join(out)

    @classmethod
    def decode(cls, data: bytes):
        (h,) = struct.unpack_from(">q", data, 0)
        if h != cls.type_hash():
            raise ValueError(
                f"{cls.__name__}: hash mismatch {h:#x} != "
                f"{cls.type_hash():#x}")
        off = 8
        msg = cls()
        for name, typ, dims in cls.__members__:
            fmt = _FMT[typ]
            if dims:
                n = 1
                for d in dims:
                    n *= d
                vals = struct.unpack_from(f">{n}{fmt}", data, off)
                off += struct.calcsize(f"{n}{fmt}")
                setattr(msg, name, list(vals))
            else:
                (val,) = struct.unpack_from(f">{fmt}", data, off)
                off += struct.calcsize(fmt)
                setattr(msg, name, val)
        return msg


class LCM:
    """Publish/subscribe endpoint over UDP multicast (or unicast loopback
    for tests, via addr=('127.0.0.1', port))."""

    def __init__(self, addr=DEFAULT_URL, ttl: int = 0, loopback: bool = True):
        self.addr = addr
        self._seq = 0
        self._subs: Dict[str, Callable] = {}
        self._is_multicast = int(addr[0].split(".")[0]) >= 224
        self._tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        if self._is_multicast:
            self._tx.setsockopt(socket.IPPROTO_IP, socket.IP_MULTICAST_TTL,
                                ttl)
            if loopback:
                self._tx.setsockopt(socket.IPPROTO_IP,
                                    socket.IP_MULTICAST_LOOP, 1)
        self._rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._rx.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        # large kernel buffers like real LCM (fragmented camera images
        # burst several 60 KB datagrams back-to-back)
        self._rx.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 8 << 20)
        self._tx.setsockopt(socket.SOL_SOCKET, socket.SO_SNDBUF, 1 << 20)
        self._rx.bind(("" if self._is_multicast else addr[0], addr[1]))
        if self._is_multicast:
            mreq = socket.inet_aton(addr[0]) + socket.inet_aton("0.0.0.0")
            self._rx.setsockopt(socket.IPPROTO_IP, socket.IP_ADD_MEMBERSHIP,
                                mreq)
        self._rx.settimeout(0.05)
        self._running = False
        self._thread: Optional[threading.Thread] = None
        self._frags: Dict[int, tuple] = {}
        self._frag_channel: Dict[int, str] = {}

    def publish(self, channel: str, data: bytes):
        if len(data) <= FRAG_SIZE:
            pkt = struct.pack(">II", MAGIC_SHORT, self._seq) \
                + channel.encode() + b"\x00" + data
            self._seq = (self._seq + 1) & 0xFFFFFFFF
            self._tx.sendto(pkt, self.addr)
            return
        # fragmented message (LCM "LC03" framing): header = magic, msg_seq,
        # total size, fragment offset, fragment number, fragment count;
        # channel string only in fragment 0.
        n_frags = (len(data) + FRAG_SIZE - 1) // FRAG_SIZE
        seq = self._seq
        self._seq = (self._seq + 1) & 0xFFFFFFFF
        for i in range(n_frags):
            off = i * FRAG_SIZE
            chunk = data[off:off + FRAG_SIZE]
            hdr = struct.pack(">IIIIHH", MAGIC_FRAG, seq, len(data), off,
                              i, n_frags)
            if i == 0:
                hdr += channel.encode() + b"\x00"
            self._tx.sendto(hdr + chunk, self.addr)

    def subscribe(self, channel: str, handler: Callable[[str, bytes], None]):
        self._subs[channel] = handler

    def handle_once(self, timeout: float = 0.05) -> bool:
        """Receive and dispatch one packet; returns False on timeout."""
        self._rx.settimeout(timeout)
        try:
            pkt, _ = self._rx.recvfrom(65535)
        except socket.timeout:
            return False
        if len(pkt) < 9:
            return False
        magic, seq = struct.unpack_from(">II", pkt, 0)
        if magic == MAGIC_SHORT:
            nul = pkt.index(b"\x00", 8)
            channel = pkt[8:nul].decode()
            handler = self._subs.get(channel)
            if handler is not None:
                handler(channel, pkt[nul + 1:])
            return True
        if magic == MAGIC_FRAG:
            _, seq, total, off, frag_no, n_frags = struct.unpack_from(
                ">IIIIHH", pkt, 0)
            body_off = struct.calcsize(">IIIIHH")
            if frag_no == 0:
                nul = pkt.index(b"\x00", body_off)
                channel = pkt[body_off:nul].decode()
                body_off = nul + 1
                self._frag_channel[seq] = channel
            buf, got = self._frags.setdefault(
                seq, (bytearray(total), set()))
            buf[off:off + len(pkt) - body_off] = pkt[body_off:]
            got.add(frag_no)
            if len(got) == n_frags and seq in self._frag_channel:
                channel = self._frag_channel.pop(seq)
                data = bytes(self._frags.pop(seq)[0])
                handler = self._subs.get(channel)
                if handler is not None:
                    handler(channel, data)
            return True
        return False

    def spin(self):
        """Background dispatch thread (the analog of StateEstimator.spin,
        go1_gym_deploy/utils/cheetah_state_estimator.py:375-397)."""
        self._running = True

        def loop():
            while self._running:
                self.handle_once(timeout=0.05)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self):
        self._running = False
        if self._thread is not None:
            self._thread.join(timeout=1.0)
        self._tx.close()
        self._rx.close()

"""Deployment message types.

Hand-written bindings for the reference's four LCM schemas
(go1_gym_deploy/lcm_types/*.lcm) — the protocol spoken between the Python
controller and the on-robot C++ bridge. Field names, types, and order are
the wire contract and must match the .lcm definitions exactly:

- state_estimator_lcmt (state_estimator_lcmt.lcm)
- leg_control_data_lcmt (leg_control_data_lcmt.lcm)
- pd_tau_targets_lcmt (pd_tau_targets_lcmt.lcm)
- rc_command_lcmt (rc_command_lcmt.lcm)
"""
from __future__ import annotations

from .lcm_wire import LCMStruct


class state_estimator_lcmt(LCMStruct):
    __members__ = [
        ("p", "float", [3]),
        ("vWorld", "float", [3]),
        ("vBody", "float", [3]),
        ("rpy", "float", [3]),
        ("omegaBody", "float", [3]),
        ("omegaWorld", "float", [3]),
        ("quat", "float", [4]),
        ("contact_estimate", "float", [4]),
        ("aBody", "float", [3]),
        ("aWorld", "float", [3]),
        ("timestamp_us", "int64_t", []),
        ("id", "int64_t", []),
        ("robot_id", "int64_t", []),
    ]


class leg_control_data_lcmt(LCMStruct):
    __members__ = [
        ("q", "float", [12]),
        ("qd", "float", [12]),
        ("p", "float", [12]),
        ("v", "float", [12]),
        ("tau_est", "float", [12]),
        ("timestamp_us", "int64_t", []),
        ("id", "int64_t", []),
        ("robot_id", "int64_t", []),
    ]


class pd_tau_targets_lcmt(LCMStruct):
    __members__ = [
        ("q_des", "double", [12]),
        ("qd_des", "double", [12]),
        ("tau_ff", "double", [12]),
        ("kp", "double", [12]),
        ("kd", "double", [12]),
        ("timestamp_us", "int64_t", []),
        ("id", "int64_t", []),
        ("robot_id", "int64_t", []),
        ("se_contactState", "double", [4]),
    ]


class rc_command_lcmt(LCMStruct):
    __members__ = [
        ("mode", "int16_t", []),
        ("left_stick", "float", [2]),
        ("right_stick", "float", [2]),
        ("knobs", "float", [2]),
        ("left_upper_switch", "int16_t", []),
        ("left_lower_left_switch", "int16_t", []),
        ("left_lower_right_switch", "int16_t", []),
        ("right_upper_switch", "int16_t", []),
        ("right_lower_left_switch", "int16_t", []),
        ("right_lower_right_switch", "int16_t", []),
    ]


class _RawBytesStruct:
    """Fixed-size raw byte payload messages (the reference's camera streams,
    go1_gym_deploy/lcm_types/camera_message_*.py). Fingerprints verified
    against the generated bindings."""

    SIZE = 0

    def __init__(self, data: bytes = b""):
        self.data = data

    @classmethod
    def type_hash(cls) -> int:
        from .lcm_wire import compute_hash
        return compute_hash([("data", "byte", [cls.SIZE])])

    def encode(self) -> bytes:
        import struct as _s
        payload = bytes(self.data[:self.SIZE])
        payload += b"\x00" * (self.SIZE - len(payload))
        return _s.pack(">q", self.type_hash()) + payload

    @classmethod
    def decode(cls, data: bytes):
        import struct as _s
        (h,) = _s.unpack_from(">q", data, 0)
        if h != cls.type_hash():
            raise ValueError(f"{cls.__name__}: hash mismatch")
        return cls(data=data[8:8 + cls.SIZE])


class camera_message_rect_wide(_RawBytesStruct):
    SIZE = 34800       # 116x100x3 rectified wide image


class camera_message_lcmt(_RawBytesStruct):
    SIZE = 278400      # 290x320x3 raw camera image

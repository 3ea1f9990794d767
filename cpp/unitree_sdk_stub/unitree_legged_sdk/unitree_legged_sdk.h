// Compile-time stub of the proprietary unitree_legged_sdk API surface used
// by the deployment bridge (the subset exercised by the reference's
// lcm_position.cpp:20-229). On the robot, the REAL SDK headers+libs replace
// this directory on the include path; this stub exists so CI can build the
// -DUSE_UNITREE_SDK backend (cpp/Makefile target `sdk`) and catch bit-rot
// without the vendor SDK.
//
// API shapes mirror unitree_legged_sdk v3.5 (Go1).
#pragma once

#include <cstdint>
#include <cstring>

namespace UNITREE_LEGGED_SDK {

constexpr int LOWLEVEL = 0xff;

enum class LeggedType { Aliengo, A1, Go1 };

struct MotorState {
  uint8_t mode{};
  float q{}, dq{}, ddq{}, tauEst{};
  float q_raw{}, dq_raw{}, ddq_raw{};
  int8_t temperature{};
  uint32_t reserve[2]{};
};

struct MotorCmd {
  uint8_t mode{};
  float q{}, dq{}, tau{}, Kp{}, Kd{};
  uint32_t reserve[3]{};
};

struct IMU {
  float quaternion[4]{};
  float gyroscope[3]{};
  float accelerometer[3]{};
  float rpy[3]{};
  int8_t temperature{};
};

struct LowState {
  uint8_t levelFlag{};
  IMU imu{};
  MotorState motorState[20]{};
  int16_t footForce[4]{};
  int16_t footForceEst[4]{};
  uint32_t tick{};
  uint8_t wirelessRemote[40]{};
  uint32_t reserve{};
  uint32_t crc{};
};

struct LowCmd {
  uint8_t levelFlag{};
  MotorCmd motorCmd[20]{};
  uint8_t wirelessRemote[40]{};
  uint32_t reserve{};
  uint32_t crc{};
};

class UDP {
 public:
  UDP(uint8_t /*level*/, int /*localPort*/, const char* /*targetIP*/,
      int /*targetPort*/) {}
  void InitCmdData(LowCmd& cmd) { cmd = LowCmd{}; }
  void Recv() {}
  void Send() {}
  int GetRecv(LowState& s) {
    s = state_;
    return 0;
  }
  int SetSend(LowCmd& cmd) {
    cmd_ = cmd;
    return 0;
  }

 private:
  LowState state_{};
  LowCmd cmd_{};
};

class Safety {
 public:
  explicit Safety(LeggedType /*type*/) {}
  // clamp commands into the per-joint safe envelope
  int PositionLimit(LowCmd& /*cmd*/) { return 0; }
  // power limit 1..10; negative return = tripped
  int PowerProtect(LowCmd& /*cmd*/, LowState& /*state*/, int /*factor*/) {
    return 0;
  }
  int PositionProtect(LowCmd& /*cmd*/, LowState& /*state*/,
                      double /*limit*/) {
    return 0;
  }
};

// joystick layout (unitree joystick.h): 40-byte wirelessRemote blob
union BtnUnion {
  uint16_t value;
  struct {
    uint8_t R1 : 1, L1 : 1, start : 1, select : 1, R2 : 1, L2 : 1, F1 : 1,
        F2 : 1, A : 1, B : 1, X : 1, Y : 1, up : 1, right : 1, down : 1,
        left : 1;
  } components;
};

struct xRockerBtnDataStruct {
  uint8_t head[2];
  BtnUnion btn;
  float lx, rx, ry, L2_v, ly;
  uint8_t idle[16];
};

}  // namespace UNITREE_LEGGED_SDK

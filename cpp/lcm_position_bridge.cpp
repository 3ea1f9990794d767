// Robot-side LCM <-> motor-controller bridge (C++, 500 Hz).
//
// TPU-framework equivalent of the reference's
// go1_gym_deploy/unitree_legged_sdk_bin/lcm_position.cpp:1-236: the
// real-time process on the robot's onboard computer that
//   - subscribes to "pd_plustau_targets" (PD setpoints from the Python
//     policy at 50 Hz),
//   - runs a 500 Hz control loop applying those targets to the motors with
//     safety limits (position clamp + torque clamp, the PositionLimit /
//     PowerProtect analog, lcm_position.cpp:206-207),
//   - publishes "state_estimator_data", "leg_control_data" and
//     "rc_command" telemetry each tick (:187-189).
//
// Differences by design:
//   - the LCM wire protocol (magic 0x4C433032 framing + lcm-gen type
//     fingerprints) is implemented from scratch below — no liblcm
//     dependency; fingerprints are bit-exact with lcm-gen (verified against
//     the reference's generated bindings by tests/test_deploy.py);
//   - the shared PD-target state is mutex-protected, fixing the benign
//     data race between the LCM handler thread and the control thread in
//     the reference (:116-129 vs :198-204, SURVEY.md 5.2);
//   - the motor interface is abstracted: SimBackend (self-contained joint
//     dynamics, used by CI and for HIL testing without hardware) or a
//     Unitree SDK backend compiled in with -DUSE_UNITREE_SDK against the
//     external unitree_legged_sdk (same integration point as the
//     reference).
//
// Build: make -C cpp   (or: g++ -O2 -std=c++17 -pthread -o lcm_position_bridge
//                       lcm_position_bridge.cpp)
// Run:   ./lcm_position_bridge --sim [--duration-s N] [--addr 239.255.76.67]

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>
#include <cstdio>

// ---------------------------------------------------------------------
// LCM wire protocol (public spec; see wtw_tpu/deploy/lcm_wire.py)
// ---------------------------------------------------------------------
static const uint32_t MAGIC_SHORT = 0x4C433032u;

static int64_t hash_update(int64_t v, char c) {
  v = ((v << 8) ^ (v >> 55)) + c;  // arithmetic shift, like lcm-gen
  return v;
}
static int64_t hash_string_update(int64_t v, const char* s) {
  v = hash_update(v, (char)strlen(s));
  for (; *s; ++s) v = hash_update(v, *s);
  return v;
}

struct Member {
  const char* name;
  const char* type;
  int dim;  // 0 = scalar
};

static int64_t compute_fingerprint(const Member* m, int n) {
  int64_t v = 0x12345678;
  for (int i = 0; i < n; ++i) {
    v = hash_string_update(v, m[i].name);
    v = hash_string_update(v, m[i].type);
    v = hash_update(v, (char)(m[i].dim ? 1 : 0));
    if (m[i].dim) {
      v = hash_update(v, 0);  // LCM_CONST
      char buf[16];
      snprintf(buf, sizeof buf, "%d", m[i].dim);
      v = hash_string_update(v, buf);
    }
  }
  return ((uint64_t)v << 1) + (((uint64_t)v >> 63) & 1);
}

// big-endian packing helpers
struct Writer {
  std::vector<uint8_t> buf;
  void u32(uint32_t v) {
    for (int i = 3; i >= 0; --i) buf.push_back((v >> (8 * i)) & 0xFF);
  }
  void i64(int64_t v) {
    for (int i = 7; i >= 0; --i) buf.push_back(((uint64_t)v >> (8 * i)) & 0xFF);
  }
  void f32(float v) {
    uint32_t u;
    memcpy(&u, &v, 4);
    u32(u);
  }
  void f64(double v) {
    uint64_t u;
    memcpy(&u, &v, 8);
    i64((int64_t)u);
  }
  void i16(int16_t v) {
    buf.push_back(((uint16_t)v >> 8) & 0xFF);
    buf.push_back((uint16_t)v & 0xFF);
  }
};

struct Reader {
  const uint8_t* p;
  size_t n, off = 0;
  bool ok = true;
  uint64_t rd(int bytes) {
    if (off + bytes > n) {
      ok = false;
      return 0;
    }
    uint64_t v = 0;
    for (int i = 0; i < bytes; ++i) v = (v << 8) | p[off++];
    return v;
  }
  int64_t i64() { return (int64_t)rd(8); }
  double f64() {
    uint64_t u = rd(8);
    double v;
    memcpy(&v, &u, 8);
    return v;
  }
  float f32() {
    uint32_t u = (uint32_t)rd(4);
    float v;
    memcpy(&v, &u, 4);
    return v;
  }
};

// ---------------------------------------------------------------------
// messages (schemas = go1_gym_deploy/lcm_types/*.lcm)
// ---------------------------------------------------------------------
struct PdTauTargets {
  double q_des[12]{}, qd_des[12]{}, tau_ff[12]{}, kp[12]{}, kd[12]{};
  int64_t timestamp_us{}, id{}, robot_id{};
  double se_contactState[4]{};
  static int64_t fingerprint() {
    static const Member m[] = {
        {"q_des", "double", 12}, {"qd_des", "double", 12},
        {"tau_ff", "double", 12}, {"kp", "double", 12},
        {"kd", "double", 12}, {"timestamp_us", "int64_t", 0},
        {"id", "int64_t", 0}, {"robot_id", "int64_t", 0},
        {"se_contactState", "double", 4}};
    static int64_t h = compute_fingerprint(m, 9);
    return h;
  }
  bool decode(const uint8_t* data, size_t n) {
    Reader r{data, n};
    if (r.i64() != fingerprint()) return false;
    for (auto& v : q_des) v = r.f64();
    for (auto& v : qd_des) v = r.f64();
    for (auto& v : tau_ff) v = r.f64();
    for (auto& v : kp) v = r.f64();
    for (auto& v : kd) v = r.f64();
    timestamp_us = r.i64();
    id = r.i64();
    robot_id = r.i64();
    for (auto& v : se_contactState) v = r.f64();
    return r.ok;
  }
};

struct LegControlData {
  float q[12]{}, qd[12]{}, p[12]{}, v[12]{}, tau_est[12]{};
  int64_t timestamp_us{}, id{}, robot_id{};
  static int64_t fingerprint() {
    static const Member m[] = {
        {"q", "float", 12}, {"qd", "float", 12}, {"p", "float", 12},
        {"v", "float", 12}, {"tau_est", "float", 12},
        {"timestamp_us", "int64_t", 0}, {"id", "int64_t", 0},
        {"robot_id", "int64_t", 0}};
    static int64_t h = compute_fingerprint(m, 8);
    return h;
  }
  void encode(Writer& w) const {
    w.i64(fingerprint());
    for (auto x : q) w.f32(x);
    for (auto x : qd) w.f32(x);
    for (auto x : p) w.f32(x);
    for (auto x : v) w.f32(x);
    for (auto x : tau_est) w.f32(x);
    w.i64(timestamp_us);
    w.i64(id);
    w.i64(robot_id);
  }
};

struct StateEstimatorMsg {
  float p[3]{}, vWorld[3]{}, vBody[3]{}, rpy[3]{}, omegaBody[3]{},
      omegaWorld[3]{}, quat[4]{0, 0, 0, 1}, contact_estimate[4]{},
      aBody[3]{}, aWorld[3]{};
  int64_t timestamp_us{}, id{}, robot_id{};
  static int64_t fingerprint() {
    static const Member m[] = {
        {"p", "float", 3}, {"vWorld", "float", 3}, {"vBody", "float", 3},
        {"rpy", "float", 3}, {"omegaBody", "float", 3},
        {"omegaWorld", "float", 3}, {"quat", "float", 4},
        {"contact_estimate", "float", 4}, {"aBody", "float", 3},
        {"aWorld", "float", 3}, {"timestamp_us", "int64_t", 0},
        {"id", "int64_t", 0}, {"robot_id", "int64_t", 0}};
    static int64_t h = compute_fingerprint(m, 13);
    return h;
  }
  void encode(Writer& w) const {
    w.i64(fingerprint());
    for (auto x : p) w.f32(x);
    for (auto x : vWorld) w.f32(x);
    for (auto x : vBody) w.f32(x);
    for (auto x : rpy) w.f32(x);
    for (auto x : omegaBody) w.f32(x);
    for (auto x : omegaWorld) w.f32(x);
    for (auto x : quat) w.f32(x);
    for (auto x : contact_estimate) w.f32(x);
    for (auto x : aBody) w.f32(x);
    for (auto x : aWorld) w.f32(x);
    w.i64(timestamp_us);
    w.i64(id);
    w.i64(robot_id);
  }
};

struct RcCommandMsg {
  int16_t mode{};
  float left_stick[2]{}, right_stick[2]{}, knobs[2]{};
  int16_t left_upper_switch{}, left_lower_left_switch{},
      left_lower_right_switch{}, right_upper_switch{},
      right_lower_left_switch{}, right_lower_right_switch{};
  static int64_t fingerprint() {
    static const Member m[] = {
        {"mode", "int16_t", 0}, {"left_stick", "float", 2},
        {"right_stick", "float", 2}, {"knobs", "float", 2},
        {"left_upper_switch", "int16_t", 0},
        {"left_lower_left_switch", "int16_t", 0},
        {"left_lower_right_switch", "int16_t", 0},
        {"right_upper_switch", "int16_t", 0},
        {"right_lower_left_switch", "int16_t", 0},
        {"right_lower_right_switch", "int16_t", 0}};
    static int64_t h = compute_fingerprint(m, 10);
    return h;
  }
  void encode(Writer& w) const {
    w.i64(fingerprint());
    w.i16(mode);
    for (auto x : left_stick) w.f32(x);
    for (auto x : right_stick) w.f32(x);
    for (auto x : knobs) w.f32(x);
    w.i16(left_upper_switch);
    w.i16(left_lower_left_switch);
    w.i16(left_lower_right_switch);
    w.i16(right_upper_switch);
    w.i16(right_lower_left_switch);
    w.i16(right_lower_right_switch);
  }
};

// ---------------------------------------------------------------------
// UDP multicast endpoint
// ---------------------------------------------------------------------
class UdpLcm {
 public:
  UdpLcm(const std::string& addr, int port) : addr_(addr), port_(port) {
    tx_ = socket(AF_INET, SOCK_DGRAM, 0);
    rx_ = socket(AF_INET, SOCK_DGRAM, 0);
    int one = 1;
    setsockopt(rx_, SOL_SOCKET, SO_REUSEADDR, &one, sizeof one);
    sockaddr_in bind_addr{};
    bind_addr.sin_family = AF_INET;
    bind_addr.sin_port = htons(port);
    bind_addr.sin_addr.s_addr = INADDR_ANY;
    bind(rx_, (sockaddr*)&bind_addr, sizeof bind_addr);
    bool mcast = (addr[0] >= '2');  // 224+ = multicast
    if (mcast) {
      ip_mreq mreq{};
      mreq.imr_multiaddr.s_addr = inet_addr(addr.c_str());
      mreq.imr_interface.s_addr = INADDR_ANY;
      setsockopt(rx_, IPPROTO_IP, IP_ADD_MEMBERSHIP, &mreq, sizeof mreq);
      int loop = 1;
      setsockopt(tx_, IPPROTO_IP, IP_MULTICAST_LOOP, &loop, sizeof loop);
    }
    timeval tv{0, 2000};  // 2 ms rx timeout: control loop stays real-time
    setsockopt(rx_, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof tv);
    memset(&dest_, 0, sizeof dest_);
    dest_.sin_family = AF_INET;
    dest_.sin_port = htons(port);
    dest_.sin_addr.s_addr = inet_addr(addr.c_str());
  }
  ~UdpLcm() {
    close(tx_);
    close(rx_);
  }

  void publish(const std::string& channel, const Writer& payload) {
    Writer pkt;
    pkt.u32(MAGIC_SHORT);
    pkt.u32(seq_++);
    for (char c : channel) pkt.buf.push_back(c);
    pkt.buf.push_back(0);
    pkt.buf.insert(pkt.buf.end(), payload.buf.begin(), payload.buf.end());
    sendto(tx_, pkt.buf.data(), pkt.buf.size(), 0, (sockaddr*)&dest_,
           sizeof dest_);
  }

  // Returns channel + payload of one packet, or false on timeout.
  bool receive(std::string& channel, std::vector<uint8_t>& payload) {
    uint8_t buf[65536];
    ssize_t n = recv(rx_, buf, sizeof buf, 0);
    if (n < 9) return false;
    uint32_t magic = ((uint32_t)buf[0] << 24) | (buf[1] << 16) |
                     (buf[2] << 8) | buf[3];
    if (magic != MAGIC_SHORT) return false;
    size_t i = 8;
    while (i < (size_t)n && buf[i] != 0) ++i;
    if (i >= (size_t)n) return false;
    channel.assign((char*)buf + 8, i - 8);
    payload.assign(buf + i + 1, buf + n);
    return true;
  }

 private:
  std::string addr_;
  int port_, tx_, rx_;
  uint32_t seq_ = 0;
  sockaddr_in dest_{};
};

// ---------------------------------------------------------------------
// motor backends
// ---------------------------------------------------------------------
struct JointState {
  double q[12], qd[12], tau_est[12];
  float rpy[3]{}, quat[4]{0, 0, 0, 1}, contact[4]{};
  float gyro[3]{}, accel[3]{};
};

class Backend {
 public:
  virtual ~Backend() = default;
  virtual void read(JointState& s) = 0;
  // Apply PD targets; implementations clamp to safe ranges.
  virtual void command(const PdTauTargets& t) = 0;
  // RC/joystick passthrough (hardware backends fill from wirelessRemote)
  virtual void fill_rc(RcCommandMsg&) {}
};

// Self-contained per-joint dynamics for CI / hardware-in-the-loop testing:
// qdd = (tau - d*qd) / inertia with the commanded PD law, integrated at the
// loop rate. Stands in for the physical robot; the Unitree SDK backend
// replaces it on the real Go1 (reference links unitree_legged_sdk,
// lcm_position.cpp:223-229).
class SimBackend : public Backend {
 public:
  explicit SimBackend(bool rc_demo = false)
      : rc_demo_(rc_demo), t0_(std::chrono::steady_clock::now()) {
    const double def[12] = {-0.1, 0.8, -1.5, 0.1, 0.8, -1.5,
                            -0.1, 1.0, -1.5, 0.1, 1.0, -1.5};
    for (int i = 0; i < 12; ++i) st_.q[i] = def[i];
  }
  // Scripted operator for HIL runs (--rc-demo): walks the reference's RC
  // protocol (cheetah_state_estimator.py:148-221) through a live
  // gait-switching session — forward stick, then gait mode buttons
  // trot -> bound -> pace -> pronk every 6 s, and a step-frequency stick
  // ramp in the final segment (the right control mode defaults to
  // step_frequency).
  void fill_rc(RcCommandMsg& rc) override {
    if (!rc_demo_) return;
    // the scripted session clock starts at the FIRST PD command received
    // (i.e. when the controller is actually up), not at bridge launch —
    // controller startup time must not eat the first gait segment
    if (!started_) return;
    double t = std::chrono::duration<double>(
                   std::chrono::steady_clock::now() - t0_)
                   .count();
    rc.left_stick[1] = t > 1.0 ? 0.5f : 0.0f;     // cmd_x = 0.5 m/s
    if (t < 8.0) rc.mode = 0;                     // trot
    else if (t < 16.0) rc.mode = 2;               // bound
    else if (t < 24.0) rc.mode = 3;               // pace
    else rc.mode = 1;                             // pronk
    // freq stick: 3.0 Hz -> 4.0 Hz in the pronk segment
    rc.right_stick[1] = t >= 24.0 ? 1.0f : 0.0f;
  }
  void read(JointState& s) override {
    std::lock_guard<std::mutex> lk(mu_);
    s = st_;
    for (int i = 0; i < 4; ++i) s.contact[i] = 250.0f;  // standing
  }
  void command(const PdTauTargets& t) override {
    std::lock_guard<std::mutex> lk(mu_);
    if (!started_) {
      started_ = true;
      t0_ = std::chrono::steady_clock::now();
    }
    const double dt = 0.002, inertia = 0.05, damping = 0.2;
    for (int i = 0; i < 12; ++i) {
      double tau = t.kp[i] * (t.q_des[i] - st_.q[i]) +
                   t.kd[i] * (t.qd_des[i] - st_.qd[i]) + t.tau_ff[i];
      tau = std::max(-33.5, std::min(33.5, tau));  // effort limit
      st_.tau_est[i] = tau;
      double qdd = (tau - damping * st_.qd[i]) / inertia;
      st_.qd[i] += dt * qdd;
      st_.q[i] += dt * st_.qd[i];
    }
  }

 private:
  std::mutex mu_;
  JointState st_{};
  bool rc_demo_ = false;
  bool started_ = false;
  std::chrono::steady_clock::time_point t0_;
};

#ifdef USE_UNITREE_SDK
// Real-hardware backend over the unitree_legged_sdk (the reference's
// UDP(LOWLEVEL)+Safety pair, lcm_position.cpp:20-33,199-210). Built by
// `make sdk` against cpp/unitree_sdk_stub (CI compile check); on the robot,
// point the include/lib path at the vendor SDK instead.
#include "unitree_legged_sdk/unitree_legged_sdk.h"
class UnitreeBackend : public Backend {
 public:
  UnitreeBackend()
      : safe_(UNITREE_LEGGED_SDK::LeggedType::Go1),
        udp_(UNITREE_LEGGED_SDK::LOWLEVEL, 8090, "192.168.123.10", 8007) {
    udp_.InitCmdData(cmd_);
  }
  void read(JointState& s) override {
    std::lock_guard<std::mutex> lk(mu_);
    udp_.Recv();
    udp_.GetRecv(state_);
    for (int i = 0; i < 12; ++i) {
      s.q[i] = state_.motorState[i].q;
      s.qd[i] = state_.motorState[i].dq;
      s.tau_est[i] = state_.motorState[i].tauEst;
    }
    for (int i = 0; i < 3; ++i) {
      s.rpy[i] = state_.imu.rpy[i];
      s.gyro[i] = state_.imu.gyroscope[i];
      s.accel[i] = state_.imu.accelerometer[i];
    }
    for (int i = 0; i < 4; ++i) {
      s.quat[i] = state_.imu.quaternion[i];
      s.contact[i] = (float)state_.footForce[i];
    }
  }
  void command(const PdTauTargets& t) override {
    std::lock_guard<std::mutex> lk(mu_);
    for (int i = 0; i < 12; ++i) {
      cmd_.motorCmd[i].q = (float)t.q_des[i];
      cmd_.motorCmd[i].dq = (float)t.qd_des[i];
      cmd_.motorCmd[i].Kp = (float)t.kp[i];
      cmd_.motorCmd[i].Kd = (float)t.kd[i];
      cmd_.motorCmd[i].tau = (float)t.tau_ff[i];
    }
    // vendor safety envelope + power limit 9 (lcm_position.cpp:207-208)
    safe_.PositionLimit(cmd_);
    safe_.PowerProtect(cmd_, state_, 9);
    udp_.SetSend(cmd_);
    udp_.Send();
  }
  void fill_rc(RcCommandMsg& rc) override {
    std::lock_guard<std::mutex> lk(mu_);
    UNITREE_LEGGED_SDK::xRockerBtnDataStruct key;
    std::memcpy(&key, &state_.wirelessRemote[0], 40);
    rc.left_stick[0] = key.lx;
    rc.left_stick[1] = key.ly;
    rc.right_stick[0] = key.rx;
    rc.right_stick[1] = key.ry;
    rc.right_lower_right_switch = key.btn.components.R2;
    rc.right_upper_switch = key.btn.components.R1;
    rc.left_lower_left_switch = key.btn.components.L2;
    rc.left_upper_switch = key.btn.components.L1;
    // mode buttons (lcm_position.cpp:148-165)
    if (key.btn.components.A) mode_ = 0;
    else if (key.btn.components.B) mode_ = 1;
    else if (key.btn.components.X) mode_ = 2;
    else if (key.btn.components.Y) mode_ = 3;
    else if (key.btn.components.up) mode_ = 4;
    else if (key.btn.components.right) mode_ = 5;
    else if (key.btn.components.down) mode_ = 6;
    else if (key.btn.components.left) mode_ = 7;
    rc.mode = mode_;
  }

 private:
  std::mutex mu_;
  UNITREE_LEGGED_SDK::Safety safe_;
  UNITREE_LEGGED_SDK::UDP udp_;
  UNITREE_LEGGED_SDK::LowCmd cmd_{};
  UNITREE_LEGGED_SDK::LowState state_{};
  int mode_ = 0;
};
#endif

// ---------------------------------------------------------------------
// bridge
// ---------------------------------------------------------------------
int main(int argc, char** argv) {
  std::string addr = "239.255.76.67";
  int port = 7667;
  double duration_s = -1;  // run forever
  bool sim = false;
  bool rc_demo = false;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    if (a == "--sim") sim = true;
    else if (a == "--rc-demo") rc_demo = true;
    else if (a == "--addr" && i + 1 < argc) addr = argv[++i];
    else if (a == "--port" && i + 1 < argc) port = atoi(argv[++i]);
    else if (a == "--duration-s" && i + 1 < argc) duration_s = atof(argv[++i]);
  }
  if (!sim) {
#ifndef USE_UNITREE_SDK
    fprintf(stderr,
            "no hardware backend compiled in (build with "
            "-DUSE_UNITREE_SDK); use --sim\n");
    return 1;
#endif
  }

  UdpLcm lcm(addr, port);
  SimBackend sim_backend(rc_demo);
  Backend* backend_p = &sim_backend;
#ifdef USE_UNITREE_SDK
  UnitreeBackend hw_backend;
  if (!sim) backend_p = &hw_backend;
#endif
  Backend& backend = *backend_p;

  std::mutex cmd_mu;
  PdTauTargets latest_cmd;
  bool have_cmd = false;
  std::atomic<bool> running{true};

  // LCM receive thread: updates the latest PD targets under a mutex
  // (the reference leaves this unguarded, lcm_position.cpp:116-129).
  std::thread rx_thread([&] {
    std::string channel;
    std::vector<uint8_t> payload;
    while (running) {
      if (!lcm.receive(channel, payload)) continue;
      if (channel == "pd_plustau_targets") {
        PdTauTargets t;
        if (t.decode(payload.data(), payload.size())) {
          // position-limit safety (Safety::PositionLimit analog :206)
          static const double lo[12] = {-1.05, -0.66, -2.82, -1.05, -0.66,
                                        -2.82, -1.05, -0.66, -2.82, -1.05,
                                        -0.66, -2.82};
          static const double hi[12] = {1.05, 4.50, -0.91, 1.05, 4.50,
                                        -0.91, 1.05, 4.50, -0.91, 1.05,
                                        4.50, -0.91};
          for (int i = 0; i < 12; ++i)
            t.q_des[i] = std::max(lo[i], std::min(hi[i], t.q_des[i]));
          std::lock_guard<std::mutex> lk(cmd_mu);
          latest_cmd = t;
          have_cmd = true;
        }
      }
    }
  });

  // 500 Hz control loop (dt = 0.002, lcm_position.cpp:47)
  auto start = std::chrono::steady_clock::now();
  auto next = start;
  const auto tick = std::chrono::microseconds(2000);
  int64_t iter = 0;
  while (running) {
    next += tick;
    {
      std::lock_guard<std::mutex> lk(cmd_mu);
      if (have_cmd) backend.command(latest_cmd);
    }
    JointState s;
    backend.read(s);
    int64_t now_us =
        std::chrono::duration_cast<std::chrono::microseconds>(
            std::chrono::steady_clock::now() - start)
            .count();

    LegControlData leg;
    for (int i = 0; i < 12; ++i) {
      leg.q[i] = (float)s.q[i];
      leg.qd[i] = (float)s.qd[i];
      leg.tau_est[i] = (float)s.tau_est[i];
    }
    leg.timestamp_us = now_us;
    Writer wl;
    leg.encode(wl);
    lcm.publish("leg_control_data", wl);

    StateEstimatorMsg se;
    for (int i = 0; i < 3; ++i) {
      se.rpy[i] = s.rpy[i];
      se.omegaBody[i] = s.gyro[i];
      se.aBody[i] = s.accel[i];
    }
    for (int i = 0; i < 4; ++i) {
      se.quat[i] = s.quat[i];
      se.contact_estimate[i] = s.contact[i];
    }
    se.timestamp_us = now_us;
    Writer ws;
    se.encode(ws);
    lcm.publish("state_estimator_data", ws);

    if (iter % 10 == 0) {  // RC at 50 Hz like the reference (:184-189)
      RcCommandMsg rc;
      backend.fill_rc(rc);
      Writer wr;
      rc.encode(wr);
      lcm.publish("rc_command", wr);
    }

    ++iter;
    if (duration_s > 0 && now_us > duration_s * 1e6) running = false;
    std::this_thread::sleep_until(next);
  }
  rx_thread.join();
  fprintf(stderr, "bridge exiting after %lld ticks\n", (long long)iter);
  return 0;
}

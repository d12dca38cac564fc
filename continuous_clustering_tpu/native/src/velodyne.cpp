// Velodyne UDP packet decoder (VLP-16 / HDL-32 / VLP-32C / VLS-128 class).
//
// Native equivalent of the reference's VelodyneInput decode path
// (include/continuous_clustering/ros/velodyne_input.hpp, which delegates to
// the vendored velodyne_pointcloud RawData parser).  Implemented from the
// public Velodyne wire format: 1206-byte data packets of 12 blocks, each
// block = 0xEEFF/0xDDFF flag, 2-byte azimuth (centi-degrees), 32 channels of
// (2-byte distance, 1-byte intensity).  Calibration (per-laser vertical
// angle, distance resolution, row mapping) is supplied by the caller.
//
// Output firings follow the reference convention: one slot per laser row,
// row = num_lasers - ring - 1 (velodyne_input.hpp:46-76), NaN for missing
// returns, per-point timestamp = packet stamp + intra-packet offset.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr int kBlocksPerPacket = 12;
constexpr int kChannelsPerBlock = 32;
constexpr float kNaN = std::numeric_limits<float>::quiet_NaN();

struct Config {
  int num_lasers;                 // 16, 32 or 128
  float distance_resolution;      // meters per tick (0.002 or 0.004)
  std::vector<float> vert_angle;  // per laser id, radians
  std::vector<float> azimuth_offset;  // per laser id, radians
  std::vector<int> ring;          // laser id -> ring (bottom=0)
  double firing_cycle_ns;         // time between consecutive firings
};

struct Decoder {
  Config cfg;
  // current firing assembly (reference SensorInput, ros/sensor_input.hpp)
  std::vector<float> xyz;        // num_lasers * 3
  std::vector<uint8_t> inten;
  std::vector<uint64_t> stamps;
  int points_in_firing = 0;
  uint64_t firing_index = 0;

  // completed firings, flattened
  std::vector<float> out_xyz;
  std::vector<uint8_t> out_inten;
  std::vector<uint64_t> out_stamps;
  int out_count = 0;

  explicit Decoder(Config c) : cfg(std::move(c)) { resetFiring(); }

  void resetFiring() {
    xyz.assign(static_cast<size_t>(cfg.num_lasers) * 3, kNaN);
    inten.assign(cfg.num_lasers, 0);
    stamps.assign(cfg.num_lasers, 0);
    points_in_firing = 0;
  }

  void emitFiring() {
    out_xyz.insert(out_xyz.end(), xyz.begin(), xyz.end());
    out_inten.insert(out_inten.end(), inten.begin(), inten.end());
    out_stamps.insert(out_stamps.end(), stamps.begin(), stamps.end());
    ++out_count;
    ++firing_index;
    resetFiring();
  }

  void addPoint(int laser_id, float azimuth_rad, float dist_m, uint8_t inty,
                uint64_t stamp) {
    int ring = cfg.ring[laser_id];
    int row = cfg.num_lasers - ring - 1;  // velodyne_input.hpp:62
    if (row < 0 || row >= cfg.num_lasers) return;
    if (!std::isnan(xyz[row * 3])) return;  // slot already filled this firing
    float va = cfg.vert_angle[laser_id];
    // velodyne rot_correction is SUBTRACTED from the raw azimuth
    // (corrected = raw - rot_correction in the velodyne_pointcloud math)
    float az = azimuth_rad - cfg.azimuth_offset[laser_id];
    if (dist_m <= 0.0f) {  // distance 0 => NaN return (velodyne_input.hpp:56)
      stamps[row] = stamp;
      ++points_in_firing;
      return;
    }
    float cv = std::cos(va), sv = std::sin(va);
    // velodyne azimuth grows clockwise from +y; convert to math convention
    float ca = std::cos(az), sa = std::sin(az);
    xyz[row * 3 + 0] = dist_m * cv * ca;
    xyz[row * 3 + 1] = -dist_m * cv * sa;
    xyz[row * 3 + 2] = dist_m * sv;
    inten[row] = inty;
    stamps[row] = stamp;
    ++points_in_firing;
  }

  // Decode one 1206-byte packet; stamp in ns.
  void decodePacket(const uint8_t* data, uint64_t stamp) {
    int group = cfg.num_lasers == 16 ? 16 : cfg.num_lasers;
    int blocks_per_firing = (group + kChannelsPerBlock - 1) / kChannelsPerBlock;
    for (int b = 0; b < kBlocksPerPacket; ++b) {
      const uint8_t* block = data + b * 100;
      uint16_t flag = static_cast<uint16_t>(block[0] | (block[1] << 8));
      // bank flags: 0xEEFF lasers 0-31, 0xDDFF 32-63, 0xCCFF 64-95 and
      // 0xBBFF 96-127 (VLS-128)
      int bank;
      switch (flag) {
        case 0xEEFF: bank = 0; break;
        case 0xDDFF: bank = 32; break;
        case 0xCCFF: bank = 64; break;
        case 0xBBFF: bank = 96; break;
        default: continue;
      }
      float azimuth =
          static_cast<float>(block[2] | (block[3] << 8)) * 0.01f * static_cast<float>(M_PI) / 180.0f;
      for (int ch = 0; ch < kChannelsPerBlock; ++ch) {
        const uint8_t* p = block + 4 + ch * 3;
        uint16_t ticks = static_cast<uint16_t>(p[0] | (p[1] << 8));
        float dist = ticks * cfg.distance_resolution;
        uint64_t t = stamp + static_cast<uint64_t>(
                                 (b * kChannelsPerBlock + ch) *
                                 cfg.firing_cycle_ns / kChannelsPerBlock);
        // VLP-16: each block holds two consecutive firings of 16 lasers
        if (cfg.num_lasers == 16) {
          if (ch == 16 && points_in_firing > 0) emitFiring();
          addPoint(ch % 16, azimuth, dist, p[2], t);
          continue;
        }
        int laser_id = bank + ch;
        if (laser_id >= cfg.num_lasers) break;
        addPoint(laser_id, azimuth, dist, p[2], t);
      }
      // a firing completes when all banks of one azimuth step were seen
      if ((b + 1) % blocks_per_firing == 0 && points_in_firing > 0) emitFiring();
    }
  }
};

}  // namespace

extern "C" {

void* cct_velodyne_create(int num_lasers, float distance_resolution,
                          const float* vert_angles_rad,
                          const float* azimuth_offsets_rad,
                          const int32_t* rings, double firing_cycle_ns) {
  Config c;
  c.num_lasers = num_lasers;
  c.distance_resolution = distance_resolution;
  c.vert_angle.assign(vert_angles_rad, vert_angles_rad + num_lasers);
  if (azimuth_offsets_rad)
    c.azimuth_offset.assign(azimuth_offsets_rad, azimuth_offsets_rad + num_lasers);
  else
    c.azimuth_offset.assign(num_lasers, 0.0f);
  if (rings) {
    c.ring.assign(rings, rings + num_lasers);
  } else {
    c.ring.resize(num_lasers);
    for (int i = 0; i < num_lasers; ++i) c.ring[i] = i;
  }
  c.firing_cycle_ns = firing_cycle_ns;
  return new Decoder(std::move(c));
}

void cct_velodyne_destroy(void* h) { delete static_cast<Decoder*>(h); }

void cct_velodyne_decode(void* h, const uint8_t* packet, int64_t size,
                         uint64_t stamp_ns) {
  if (size >= 1200) static_cast<Decoder*>(h)->decodePacket(packet, stamp_ns);
}

// Poll completed firings; returns count and copies into caller buffers sized
// max_firings * num_lasers.  Buffers: xyz (f32 x3), intensity, stamps.
int cct_velodyne_poll(void* h, int max_firings, float* xyz, uint8_t* inten,
                      uint64_t* stamps) {
  auto* d = static_cast<Decoder*>(h);
  int n = d->out_count < max_firings ? d->out_count : max_firings;
  size_t rows = static_cast<size_t>(d->cfg.num_lasers);
  std::memcpy(xyz, d->out_xyz.data(), n * rows * 3 * sizeof(float));
  std::memcpy(inten, d->out_inten.data(), n * rows * sizeof(uint8_t));
  std::memcpy(stamps, d->out_stamps.data(), n * rows * sizeof(uint64_t));
  d->out_xyz.erase(d->out_xyz.begin(), d->out_xyz.begin() + n * rows * 3);
  d->out_inten.erase(d->out_inten.begin(), d->out_inten.begin() + n * rows);
  d->out_stamps.erase(d->out_stamps.begin(), d->out_stamps.begin() + n * rows);
  d->out_count -= n;
  return n;
}
}

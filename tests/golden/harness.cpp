// Golden-test harness: drives the *reference* clustering core (compiled
// unmodified from /root/reference) on a synthetic firing stream and dumps
// per-point results for comparison against the TPU pipeline.
//
// Input (binary, little endian):
//   i32 num_rows, i32 num_columns, i32 F
//   f32 max_distance, i32 stop_after_association, i32 chessboard,
//   i32 cluster_point_trees_every_nth_column,
//   f32 ego[6] (h_max, h_ground, l_front, l_rear, w_left, w_right)
//   then F firings: f64 pose[12] (row-major 3x4), then num_rows points:
//     f32 x, y, z; u64 stamp; u64 uidx; u8 intensity
// Output (binary): records of (u64 uidx, u8 ground_label, u64 cluster_id)
// for every point in a finalized column (finished_column callback,
// ground_only=false), ground_label as the raw published enum value.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <memory>
#include <vector>

#include <continuous_clustering/clustering/continuous_clustering.hpp>

using namespace continuous_clustering;

int main(int argc, char** argv) {
  if (argc != 3) {
    std::cerr << "usage: harness <in.bin> <out.bin>\n";
    return 1;
  }
  std::ifstream in(argv[1], std::ios::binary);
  std::ofstream out(argv[2], std::ios::binary);

  int32_t num_rows, num_columns, F, stop_assoc, chessboard, nth, fog;
  float max_distance, ego[6];
  in.read(reinterpret_cast<char*>(&num_rows), 4);
  in.read(reinterpret_cast<char*>(&num_columns), 4);
  in.read(reinterpret_cast<char*>(&F), 4);
  in.read(reinterpret_cast<char*>(&max_distance), 4);
  in.read(reinterpret_cast<char*>(&stop_assoc), 4);
  in.read(reinterpret_cast<char*>(&chessboard), 4);
  in.read(reinterpret_cast<char*>(&nth), 4);
  in.read(reinterpret_cast<char*>(&fog), 4);
  in.read(reinterpret_cast<char*>(ego), 24);

  ContinuousClustering clustering;
  Configuration config;
  config.general.is_single_threaded = true;
  config.range_image.num_columns = num_columns;
  config.clustering.max_distance = max_distance;
  config.clustering.stop_after_association_enabled = stop_assoc != 0;
  config.clustering.ignore_points_in_chessboard_pattern = chessboard != 0;
  config.clustering.cluster_point_trees_every_nth_column = nth;
  config.ground_segmentation.fog_filtering_enabled = fog != 0;
  config.ground_segmentation.height_ref_to_maximum_ = ego[0];
  config.ground_segmentation.height_ref_to_ground_ = ego[1];
  config.ground_segmentation.length_ref_to_front_end_ = ego[2];
  config.ground_segmentation.length_ref_to_rear_end_ = ego[3];
  config.ground_segmentation.width_ref_to_left_mirror_ = ego[4];
  config.ground_segmentation.width_ref_to_right_mirror_ = ego[5];
  clustering.setConfiguration(config);
  clustering.reset(num_rows);
  clustering.setTransformRobotFrameFromSensorFrame(Eigen::Isometry3d::Identity());

  clustering.setFinishedColumnCallback(
      [&](int64_t from, int64_t to, bool ground_only) {
        if (ground_only) return;
        for (int64_t g = from; g <= to; ++g) {
          int lc = static_cast<int>(g % clustering.ring_buffer_max_columns);
          for (int r = 0; r < clustering.num_rows_; ++r) {
            const Point& p =
                clustering.range_image_[lc * clustering.num_rows_ + r];
            if (p.globally_unique_point_index == static_cast<uint64_t>(-1))
              continue;
            // raw color-enum value: the TPU framework now uses the same
            // published label values, so compare without normalization
            uint8_t gl = static_cast<uint8_t>(p.ground_point_label);
            uint64_t uidx = p.globally_unique_point_index;
            uint64_t id = p.id;
            out.write(reinterpret_cast<const char*>(&uidx), 8);
            out.write(reinterpret_cast<const char*>(&gl), 1);
            out.write(reinterpret_cast<const char*>(&id), 8);
          }
        }
      });

  for (int f = 0; f < F; ++f) {
    double pose[12];
    in.read(reinterpret_cast<char*>(pose), sizeof(pose));
    auto firing = std::make_shared<RawPoints>();
    firing->points.resize(num_rows);
    uint64_t min_stamp = ~0ULL;
    for (int r = 0; r < num_rows; ++r) {
      float xyz[3];
      uint64_t stamp, uidx;
      uint8_t intensity;
      in.read(reinterpret_cast<char*>(xyz), 12);
      in.read(reinterpret_cast<char*>(&stamp), 8);
      in.read(reinterpret_cast<char*>(&uidx), 8);
      in.read(reinterpret_cast<char*>(&intensity), 1);
      RawPoint& p = firing->points[r];
      p.x = xyz[0];
      p.y = xyz[1];
      p.z = xyz[2];
      p.stamp = stamp;
      p.globally_unique_point_index = uidx;
      p.intensity = intensity;
      p.firing_index = f;
      if (stamp < min_stamp) min_stamp = stamp;
    }
    firing->stamp = min_stamp;

    Eigen::Isometry3d tf = Eigen::Isometry3d::Identity();
    for (int i = 0; i < 3; ++i)
      tf.setRotationRow(i, pose[i * 4], pose[i * 4 + 1], pose[i * 4 + 2]);
    tf.setTranslation(Eigen::Vector3d(pose[3], pose[7], pose[11]));

    clustering.addFiring(firing, tf);
    if (clustering.resetRequired()) {
      std::cerr << "reset required at firing " << f << "\n";
      return 2;
    }
  }
  return 0;
}

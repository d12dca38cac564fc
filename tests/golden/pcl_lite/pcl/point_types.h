// PCL stub for golden builds: only the types the reference evaluation uses.
#pragma once
namespace pcl {
struct PointXYZINormal {
  float x{0}, y{0}, z{0}, intensity{0}, curvature{0};
};
}

// PCL stub: online GT generation is unsupported in golden builds — tests
// must pre-generate labels_euclidean_clustering so this path is never hit.
#pragma once
#include <memory>
#include <stdexcept>
#include <vector>
#include <pcl/point_types.h>

namespace pcl {
template <typename P>
struct PointCloud {
  using Ptr = std::shared_ptr<PointCloud<P>>;
  PointCloud(int n, int) : pts(n) {}
  P& operator[](int i) { return pts[i]; }
  std::vector<P> pts;
};
struct PointIndices {
  std::vector<int> indices;
};
using IndicesClusters = std::vector<PointIndices>;

template <typename P>
class ConditionalEuclideanClustering {
 public:
  void setInputCloud(typename PointCloud<P>::Ptr) {}
  void setConditionFunction(bool (*)(const P&, const P&, float)) {}
  void setMinClusterSize(int) {}
  void setMaxClusterSize(int) {}
  void setClusterTolerance(double) {}
  void segment(IndicesClusters&) {
    throw std::runtime_error(
        "golden build: PCL clustering unavailable; pre-generate "
        "labels_euclidean_clustering with the gt_label_generator tool");
  }
};
}  // namespace pcl

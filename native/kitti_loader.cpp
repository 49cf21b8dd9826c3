// Native SemanticKITTI frame loader: the TPU-framework counterpart of the
// reference's C++ `data_loaders` dependency (built at install,
// /root/reference/README.md:45-46) and of its 8 Python loader workers
// (/root/reference/train_ln.py:56-57).
//
// One call performs the per-frame hot path of the dataset __getitem__
// (kitti_dataloader.py:123-186): read the .bin scan and .label file, remap
// labels through the LUT, apply distance filters, the velo->world ->
// inverse-first-scan pose chain and the -90deg x-rotation, and emit padded
// float32/int32 arrays ready for device transfer.  A std::thread pool loads
// the frames of a sequence window in parallel.
//
// C ABI only (consumed via ctypes); no Python headers needed.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Mat4 {
  double m[16];  // row-major
  static Mat4 from(const double* p) {
    Mat4 out;
    std::memcpy(out.m, p, sizeof(out.m));
    return out;
  }
  Mat4 mul(const Mat4& o) const {
    Mat4 r{};
    for (int i = 0; i < 4; ++i)
      for (int j = 0; j < 4; ++j) {
        double s = 0;
        for (int k = 0; k < 4; ++k) s += m[i * 4 + k] * o.m[k * 4 + j];
        r.m[i * 4 + j] = s;
      }
    return r;
  }
};

// -90 degree rotation about x (DataTransformer.py:19-31 with angle=-90):
// (x, y, z) -> (x, z, -y)
inline void rot_x_m90(double& x, double& y, double& z) {
  double ny = z, nz = -y;
  y = ny;
  z = nz;
}

bool read_file(const char* path, std::vector<char>& buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  buf.resize(static_cast<size_t>(n));
  size_t got = n ? std::fread(buf.data(), 1, static_cast<size_t>(n), f) : 0;
  std::fclose(f);
  return got == static_cast<size_t>(n);
}

struct FrameJob {
  const char* scan_path;
  const char* label_path;        // nullptr => zeros
  const int32_t* remap_lut;
  int32_t lut_size;
  const double* pose;            // velo-to-world 4x4 or nullptr
  const double* inv_first_pose;  // world-to-first 4x4 or nullptr
  double cap_distance;           // <0 disables
  double min_distance;           // <0 disables
  int32_t max_points;
  // outputs (caller-allocated, max_points rows)
  float* out_xyz;       // (max_points, 3)
  float* out_refl;      // (max_points,)
  int32_t* out_labels;  // (max_points,)
  int32_t* out_count;   // scalar
  int32_t* out_status;  // 0 ok, <0 error
};

void run_frame(const FrameJob& j) {
  *j.out_count = 0;
  *j.out_status = 0;

  std::vector<char> scan_buf;
  if (!read_file(j.scan_path, scan_buf) || scan_buf.size() % 16 != 0) {
    *j.out_status = -1;
    return;
  }
  const float* pts = reinterpret_cast<const float*>(scan_buf.data());
  const int64_t n = static_cast<int64_t>(scan_buf.size() / 16);

  std::vector<int32_t> labels(static_cast<size_t>(n), 0);
  if (j.label_path != nullptr) {
    std::vector<char> lab_buf;
    if (!read_file(j.label_path, lab_buf) ||
        lab_buf.size() != static_cast<size_t>(n) * 4) {
      *j.out_status = -2;
      return;
    }
    const uint32_t* raw = reinterpret_cast<const uint32_t*>(lab_buf.data());
    for (int64_t i = 0; i < n; ++i) {
      uint32_t sem = raw[i] & 0xFFFFu;  // lower 16 bits = semantic label
      labels[static_cast<size_t>(i)] =
          (sem < static_cast<uint32_t>(j.lut_size)) ? j.remap_lut[sem] : 0;
    }
  }

  const bool do_pose = j.pose != nullptr && j.inv_first_pose != nullptr;
  Mat4 chain{};
  if (do_pose) {
    chain = Mat4::from(j.inv_first_pose).mul(Mat4::from(j.pose));
  }

  const double cap2 = j.cap_distance >= 0 ? j.cap_distance * j.cap_distance : -1;
  const double min2 = j.min_distance >= 0 ? j.min_distance * j.min_distance : -1;

  int32_t out_i = 0;
  for (int64_t i = 0; i < n && out_i < j.max_points; ++i) {
    const float* p = pts + i * 4;
    double x = p[0], y = p[1], z = p[2];
    const double d2 = x * x + y * y + z * z;
    if (cap2 >= 0 && d2 >= cap2) continue;
    if (min2 >= 0 && d2 <= min2) continue;

    if (do_pose) {
      const double* M = chain.m;
      double nx = M[0] * x + M[1] * y + M[2] * z + M[3];
      double ny = M[4] * x + M[5] * y + M[6] * z + M[7];
      double nz = M[8] * x + M[9] * y + M[10] * z + M[11];
      double w = M[12] * x + M[13] * y + M[14] * z + M[15];
      x = nx / w;
      y = ny / w;
      z = nz / w;
    }
    rot_x_m90(x, y, z);

    j.out_xyz[out_i * 3 + 0] = static_cast<float>(x);
    j.out_xyz[out_i * 3 + 1] = static_cast<float>(y);
    j.out_xyz[out_i * 3 + 2] = static_cast<float>(z);
    j.out_refl[out_i] = p[3];
    j.out_labels[out_i] = labels[static_cast<size_t>(i)];
    ++out_i;
  }
  *j.out_count = out_i;
}

}  // namespace

extern "C" {

// Load one frame; returns 0 on success.
int tln_load_frame(const char* scan_path, const char* label_path,
                   const int32_t* remap_lut, int32_t lut_size,
                   const double* pose, const double* inv_first_pose,
                   double cap_distance, double min_distance,
                   int32_t max_points, float* out_xyz, float* out_refl,
                   int32_t* out_labels, int32_t* out_count) {
  int32_t status = 0;
  FrameJob j{scan_path, label_path, remap_lut,       lut_size,
             pose,      inv_first_pose, cap_distance, min_distance,
             max_points, out_xyz,   out_refl,        out_labels,
             out_count, &status};
  run_frame(j);
  return status;
}

// Load the F frames of a sequence window in parallel (one thread each).
// Array arguments are packed per frame; paths are arrays of pointers.
int tln_load_frames(int32_t n_frames, const char** scan_paths,
                    const char** label_paths, const int32_t* remap_lut,
                    int32_t lut_size, const double* poses,
                    const double* inv_first_pose, double cap_distance,
                    double min_distance, int32_t max_points, float* out_xyz,
                    float* out_refl, int32_t* out_labels, int32_t* out_counts) {
  std::vector<int32_t> status(static_cast<size_t>(n_frames), 0);
  std::vector<std::thread> threads;
  threads.reserve(static_cast<size_t>(n_frames));
  for (int32_t f = 0; f < n_frames; ++f) {
    FrameJob j{scan_paths[f],
               label_paths ? label_paths[f] : nullptr,
               remap_lut,
               lut_size,
               poses ? poses + 16 * f : nullptr,
               inv_first_pose,
               cap_distance,
               min_distance,
               max_points,
               out_xyz + static_cast<int64_t>(f) * max_points * 3,
               out_refl + static_cast<int64_t>(f) * max_points,
               out_labels + static_cast<int64_t>(f) * max_points,
               out_counts + f,
               &status[static_cast<size_t>(f)]};
    threads.emplace_back(run_frame, j);
  }
  for (auto& t : threads) t.join();
  for (int32_t f = 0; f < n_frames; ++f)
    if (status[static_cast<size_t>(f)] != 0) return status[static_cast<size_t>(f)];
  return 0;
}

}  // extern "C"

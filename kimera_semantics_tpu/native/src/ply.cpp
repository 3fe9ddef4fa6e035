// Native PLY writer — host-side runtime component of kimera_semantics_tpu.
// Counterpart of voxblox's mesh PLY export (used via generateMesh,
// kimera_semantics_ros/src/kimera_semantics_rosbag.cpp:148). Binary
// little-endian, identical byte layout to the numpy fallback in io/ply.py.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>

extern "C" {

// Returns 0 on success, negative errno-style codes on failure.
int ksd_write_ply(const char* path, const float* vertices,
                  const uint8_t* colors, int64_t num_vertices,
                  const int32_t* triangles, int64_t num_triangles) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;

  char header[512];
  int n = std::snprintf(
      header, sizeof(header),
      "ply\nformat binary_little_endian 1.0\n"
      "element vertex %lld\n"
      "property float x\nproperty float y\nproperty float z\n"
      "property uchar red\nproperty uchar green\nproperty uchar blue\n"
      "element face %lld\n"
      "property list uchar int vertex_indices\n"
      "end_header\n",
      static_cast<long long>(num_vertices),
      static_cast<long long>(num_triangles));
  if (n <= 0 || std::fwrite(header, 1, n, f) != static_cast<size_t>(n)) {
    std::fclose(f);
    return -2;
  }

  // Interleave vertex records (12B xyz + 3B rgb) through a buffered chunk.
  constexpr int64_t kChunk = 4096;
  unsigned char buf[kChunk * 15];
  for (int64_t i = 0; i < num_vertices; i += kChunk) {
    int64_t m = (num_vertices - i < kChunk) ? num_vertices - i : kChunk;
    for (int64_t j = 0; j < m; ++j) {
      std::memcpy(buf + j * 15, vertices + (i + j) * 3, 12);
      std::memcpy(buf + j * 15 + 12, colors + (i + j) * 3, 3);
    }
    if (std::fwrite(buf, 15, m, f) != static_cast<size_t>(m)) {
      std::fclose(f);
      return -3;
    }
  }

  unsigned char fbuf[kChunk * 13];
  for (int64_t i = 0; i < num_triangles; i += kChunk) {
    int64_t m = (num_triangles - i < kChunk) ? num_triangles - i : kChunk;
    for (int64_t j = 0; j < m; ++j) {
      fbuf[j * 13] = 3;
      std::memcpy(fbuf + j * 13 + 1, triangles + (i + j) * 3, 12);
    }
    if (std::fwrite(fbuf, 13, m, f) != static_cast<size_t>(m)) {
      std::fclose(f);
      return -4;
    }
  }
  std::fclose(f);
  return 0;
}

// Variant with per-vertex normals (x y z nx ny nz red green blue — the
// voxblox Mesh::hasNormals() PLY layout). 27-byte vertex records.
int ksd_write_ply_normals(const char* path, const float* vertices,
                          const float* normals, const uint8_t* colors,
                          int64_t num_vertices, const int32_t* triangles,
                          int64_t num_triangles) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;

  char header[640];
  int n = std::snprintf(
      header, sizeof(header),
      "ply\nformat binary_little_endian 1.0\n"
      "element vertex %lld\n"
      "property float x\nproperty float y\nproperty float z\n"
      "property float nx\nproperty float ny\nproperty float nz\n"
      "property uchar red\nproperty uchar green\nproperty uchar blue\n"
      "element face %lld\n"
      "property list uchar int vertex_indices\n"
      "end_header\n",
      static_cast<long long>(num_vertices),
      static_cast<long long>(num_triangles));
  if (n <= 0 || std::fwrite(header, 1, n, f) != static_cast<size_t>(n)) {
    std::fclose(f);
    return -2;
  }

  constexpr int64_t kChunk = 4096;
  unsigned char buf[kChunk * 27];
  for (int64_t i = 0; i < num_vertices; i += kChunk) {
    int64_t m = (num_vertices - i < kChunk) ? num_vertices - i : kChunk;
    for (int64_t j = 0; j < m; ++j) {
      std::memcpy(buf + j * 27, vertices + (i + j) * 3, 12);
      std::memcpy(buf + j * 27 + 12, normals + (i + j) * 3, 12);
      std::memcpy(buf + j * 27 + 24, colors + (i + j) * 3, 3);
    }
    if (std::fwrite(buf, 27, m, f) != static_cast<size_t>(m)) {
      std::fclose(f);
      return -3;
    }
  }

  unsigned char fbuf[kChunk * 13];
  for (int64_t i = 0; i < num_triangles; i += kChunk) {
    int64_t m = (num_triangles - i < kChunk) ? num_triangles - i : kChunk;
    for (int64_t j = 0; j < m; ++j) {
      fbuf[j * 13] = 3;
      std::memcpy(fbuf + j * 13 + 1, triangles + (i + j) * 3, 12);
    }
    if (std::fwrite(fbuf, 13, m, f) != static_cast<size_t>(m)) {
      std::fclose(f);
      return -4;
    }
  }
  std::fclose(f);
  return 0;
}

}  // extern "C"

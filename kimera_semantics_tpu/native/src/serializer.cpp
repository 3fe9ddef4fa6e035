// Native block-layer serializer — checkpoint/resume runtime component.
// Counterpart of voxblox's .vxblx protobuf layer files (saveMap/LoadBlocksFromFile,
// kimera_semantics_rosbag.cpp:150, semantic_simulation_server.cpp:57-89), with a
// simple versioned binary container instead of protobuf. Unlike the reference,
// the semantic channels ARE serialized (SURVEY 5.4 flags their omission as a gap).
//
// File layout (little-endian):
//   magic "KSDV" | u32 version | u32 num_named_arrays
//   per array: u32 name_len | name bytes | u32 dtype_code | u32 ndim |
//              i64 dims[ndim] | raw bytes
// dtype codes: 0=f32, 1=i32, 2=u8, 3=bool

#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

static const char kMagic[4] = {'K', 'S', 'D', 'V'};

int ksd_serializer_open_write(const char* path, uint32_t num_arrays,
                              void** handle) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  uint32_t version = 1;
  if (std::fwrite(kMagic, 1, 4, f) != 4 ||
      std::fwrite(&version, 4, 1, f) != 1 ||
      std::fwrite(&num_arrays, 4, 1, f) != 1) {
    std::fclose(f);
    return -2;
  }
  *handle = f;
  return 0;
}

int ksd_serializer_write_array(void* handle, const char* name,
                               uint32_t dtype_code, uint32_t ndim,
                               const int64_t* dims, const void* data,
                               int64_t nbytes) {
  FILE* f = static_cast<FILE*>(handle);
  uint32_t name_len = static_cast<uint32_t>(std::strlen(name));
  if (std::fwrite(&name_len, 4, 1, f) != 1) return -1;
  if (std::fwrite(name, 1, name_len, f) != name_len) return -1;
  if (std::fwrite(&dtype_code, 4, 1, f) != 1) return -1;
  if (std::fwrite(&ndim, 4, 1, f) != 1) return -1;
  if (std::fwrite(dims, 8, ndim, f) != ndim) return -1;
  if (nbytes > 0 &&
      std::fwrite(data, 1, nbytes, f) != static_cast<size_t>(nbytes))
    return -2;
  return 0;
}

int ksd_serializer_close(void* handle) {
  return std::fclose(static_cast<FILE*>(handle)) == 0 ? 0 : -1;
}

}  // extern "C"

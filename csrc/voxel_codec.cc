// Native voxel wire codec + varint stream framing.
//
// The runtime-side counterpart of the reference's C++ serialization
// (voxblox src/core/block.cc:65-255 voxel bit layouts and
// src/utils/protobuf_utils.cc varint-delimited framing): hot (de)serialize
// loops for checkpoint/interop IO live in native code; Python orchestrates.
// Exposed as a C ABI consumed through ctypes (voxblox_tpu/io/native.py),
// with a numpy fallback when the shared library is absent.
//
// Wire layouts (uint32 words per voxel):
//   tsdf:      [f32 distance][f32 weight][r<<24|g<<16|b<<8|a]
//   esdf:      [f32 distance][px<<24|py<<16|pz<<8|flags]
//   occupancy: [f32 log_odds][observed]
//   intensity: [f32 intensity][f32 weight]

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// TSDF
// ---------------------------------------------------------------------------

void tsdf_pack(const float* dist, const float* weight, const float* rgb,
               uint32_t* out, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    uint32_t w0, w1;
    std::memcpy(&w0, &dist[i], 4);
    std::memcpy(&w1, &weight[i], 4);
    auto clamp_byte = [](float v) -> uint32_t {
      float r = v < 0.f ? 0.f : (v > 255.f ? 255.f : v);
      return static_cast<uint32_t>(r + 0.5f);
    };
    uint32_t w2 = (clamp_byte(rgb[3 * i]) << 24) |
                  (clamp_byte(rgb[3 * i + 1]) << 16) |
                  (clamp_byte(rgb[3 * i + 2]) << 8) | 0xFFu;
    out[3 * i] = w0;
    out[3 * i + 1] = w1;
    out[3 * i + 2] = w2;
  }
}

void tsdf_unpack(const uint32_t* in, float* dist, float* weight, float* rgb,
                 int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    std::memcpy(&dist[i], &in[3 * i], 4);
    std::memcpy(&weight[i], &in[3 * i + 1], 4);
    uint32_t w2 = in[3 * i + 2];
    rgb[3 * i] = static_cast<float>((w2 >> 24) & 0xFF);
    rgb[3 * i + 1] = static_cast<float>((w2 >> 16) & 0xFF);
    rgb[3 * i + 2] = static_cast<float>((w2 >> 8) & 0xFF);
  }
}

// ---------------------------------------------------------------------------
// ESDF. flags wire bits: observed=1, hallucinated=2, in_queue=4, fixed=8
// (pool bits: observed=1, fixed=2, hallucinated=4, in_queue=8).
// ---------------------------------------------------------------------------

void esdf_pack(const float* dist, const uint8_t* flags, const int8_t* parent,
               uint32_t* out, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    uint32_t w0;
    std::memcpy(&w0, &dist[i], 4);
    uint8_t f = flags[i];
    uint32_t wire = ((f & 1u) ? 1u : 0u) |      // observed
                    ((f & 4u) ? 2u : 0u) |      // hallucinated
                    ((f & 8u) ? 4u : 0u) |      // in_queue
                    ((f & 2u) ? 8u : 0u);       // fixed
    uint32_t w1 = (static_cast<uint32_t>(static_cast<uint8_t>(parent[3 * i]))
                   << 24) |
                  (static_cast<uint32_t>(
                       static_cast<uint8_t>(parent[3 * i + 1]))
                   << 16) |
                  (static_cast<uint32_t>(
                       static_cast<uint8_t>(parent[3 * i + 2]))
                   << 8) |
                  wire;
    out[2 * i] = w0;
    out[2 * i + 1] = w1;
  }
}

void esdf_unpack(const uint32_t* in, float* dist, uint8_t* flags,
                 int8_t* parent, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    std::memcpy(&dist[i], &in[2 * i], 4);
    uint32_t w1 = in[2 * i + 1];
    uint8_t f = 0;
    if (w1 & 1u) f |= 1;   // observed
    if (w1 & 2u) f |= 4;   // hallucinated
    if (w1 & 4u) f |= 8;   // in_queue
    if (w1 & 8u) f |= 2;   // fixed
    flags[i] = f;
    parent[3 * i] = static_cast<int8_t>((w1 >> 24) & 0xFF);
    parent[3 * i + 1] = static_cast<int8_t>((w1 >> 16) & 0xFF);
    parent[3 * i + 2] = static_cast<int8_t>((w1 >> 8) & 0xFF);
  }
}

// ---------------------------------------------------------------------------
// Occupancy / intensity
// ---------------------------------------------------------------------------

void occupancy_pack(const float* log_odds, const uint8_t* observed,
                    uint32_t* out, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    std::memcpy(&out[2 * i], &log_odds[i], 4);
    out[2 * i + 1] = observed[i] ? 1u : 0u;
  }
}

void occupancy_unpack(const uint32_t* in, float* log_odds, uint8_t* observed,
                      int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    std::memcpy(&log_odds[i], &in[2 * i], 4);
    observed[i] = (in[2 * i + 1] & 0xFF) ? 1 : 0;
  }
}

void intensity_pack(const float* intensity, const float* weight, uint32_t* out,
                    int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    std::memcpy(&out[2 * i], &intensity[i], 4);
    std::memcpy(&out[2 * i + 1], &weight[i], 4);
  }
}

void intensity_unpack(const uint32_t* in, float* intensity, float* weight,
                      int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    std::memcpy(&intensity[i], &in[2 * i], 4);
    std::memcpy(&weight[i], &in[2 * i + 1], 4);
  }
}

// ---------------------------------------------------------------------------
// Varint framing (protobuf_utils.cc semantics)
// ---------------------------------------------------------------------------

// Writes varint32 of `value` into buf (>= 5 bytes); returns bytes written.
int32_t write_varint32(uint32_t value, uint8_t* buf) {
  int32_t i = 0;
  while (true) {
    uint8_t b = value & 0x7F;
    value >>= 7;
    if (value) {
      buf[i++] = b | 0x80;
    } else {
      buf[i++] = b;
      return i;
    }
  }
}

// Reads varint32 from buf (max `len` bytes). Returns bytes consumed or -1.
int32_t read_varint32(const uint8_t* buf, int64_t len, uint32_t* out) {
  uint32_t result = 0;
  int32_t shift = 0;
  for (int32_t i = 0; i < len && i < 5; ++i) {
    result |= static_cast<uint32_t>(buf[i] & 0x7F) << shift;
    if (!(buf[i] & 0x80)) {
      *out = result;
      return i + 1;
    }
    shift += 7;
  }
  return -1;
}

}  // extern "C"

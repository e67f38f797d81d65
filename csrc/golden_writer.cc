// Golden .vxblx writer using google::protobuf's C++ coded streams.
//
// Emits a layer file with the exact stream framing the reference library
// produces (voxblox utils/protobuf_utils.cc: WriteVarint32 message count,
// then varint-delimited LayerProto + BlockProto messages) and the
// reference TSDF voxel word layout (src/core/block.cc:159-200). Used by
// tests/test_io.py to cross-check the Python reader against Google's C++
// encoder — a genuine two-implementation interop test of the wire format.
//
// Build: g++ -std=c++17 golden_writer.cc Layer.pb.cc Block.pb.cc -lprotobuf

#include <cstdint>
#include <cstring>
#include <fstream>
#include <vector>

#include <google/protobuf/io/coded_stream.h>
#include <google/protobuf/io/zero_copy_stream_impl.h>

#include "voxblox/Block.pb.h"
#include "voxblox/Layer.pb.h"

int main(int argc, char** argv) {
  if (argc < 2) return 1;
  const char* path = argv[1];
  const int vps = 4;
  const int n_vox = vps * vps * vps;
  const double voxel_size = 0.25;

  voxblox::LayerProto layer;
  layer.set_voxel_size(voxel_size);
  layer.set_voxels_per_side(vps);
  layer.set_type("tsdf");

  voxblox::BlockProto block;
  block.set_voxels_per_side(vps);
  block.set_voxel_size(voxel_size);
  block.set_origin_x(1.0);  // block index (1, -2, 0) at block size 1.0
  block.set_origin_y(-2.0);
  block.set_origin_z(0.0);
  block.set_has_data(true);
  for (int i = 0; i < n_vox; ++i) {
    float dist = 0.01f * i - 0.3f;
    float weight = 0.5f + 0.01f * i;
    uint32_t w0, w1;
    std::memcpy(&w0, &dist, 4);
    std::memcpy(&w1, &weight, 4);
    uint32_t r = (i * 3) % 256, g = (i * 5) % 256, b = (i * 7) % 256;
    uint32_t w2 = (r << 24) | (g << 16) | (b << 8) | 0xFFu;
    block.add_voxel_data(w0);
    block.add_voxel_data(w1);
    block.add_voxel_data(w2);
  }

  std::ofstream out(path, std::ios::binary);
  {
    google::protobuf::io::OstreamOutputStream raw(&out);
    google::protobuf::io::CodedOutputStream coded(&raw);
    coded.WriteVarint32(2);  // LayerProto + 1 block
    coded.WriteVarint32(layer.ByteSizeLong());
    layer.SerializeToCodedStream(&coded);
    coded.WriteVarint32(block.ByteSizeLong());
    block.SerializeToCodedStream(&coded);
  }
  out.close();
  return 0;
}

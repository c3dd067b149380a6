// Native host runtime for msst_tpu.
//
// C++ equivalents of the reference's C++ driver internals, exposed through a
// plain C ABI for ctypes:
//   * decode_packets   — batch Velodyne-style 1206-byte packet decode
//                        (the timoo_pointcloud RawData::unpack role,
//                        timoo/src/timoo_pointcloud/src/lib/rawdata.cc:306-519)
//                        with a precomputed sin/cos LUT over 36000 azimuth
//                        steps like the reference (:263-267);
//   * pcap_read_packets — offline pcap replay source (the InputPCAP role,
//                        timoo/src/timoo_driver/src/lib/input.cc:264-380);
//   * udp_open/udp_recv_batch — live UDP capture with poll() timeout
//                        (InputSocket::getPacket, input.cc:131-190);
//   * ring buffer      — lock-free SPSC packet queue for the capture thread
//                        (replaces the ROS-queue decoupling).
//
// Build: `make` in this directory -> libmsst_native.so.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <arpa/inet.h>
#include <fcntl.h>
#include <netinet/in.h>
#include <poll.h>
#include <sys/socket.h>
#include <unistd.h>

namespace {

constexpr int kPacketSize = 1206;
constexpr int kBlocks = 12;
constexpr int kChannels = 32;
constexpr int kLasers = 16;
constexpr uint16_t kBlockFlag = 0xEEFF;
constexpr float kFiringCycleUs = 55.296f;
constexpr float kSingleFiringUs = 2.304f;

// Precomputed azimuth sin/cos table, 0.01-degree steps (rawdata.cc:263-267).
struct AzimuthLut {
  std::vector<float> sin_t, cos_t;
  AzimuthLut() : sin_t(36000), cos_t(36000) {
    for (int i = 0; i < 36000; ++i) {
      double a = (i / 100.0) * M_PI / 180.0;
      sin_t[i] = static_cast<float>(std::sin(a));
      cos_t[i] = static_cast<float>(std::cos(a));
    }
  }
};
const AzimuthLut& lut() {
  static AzimuthLut t;
  return t;
}

inline int ring_of_laser(const float* vert, int laser) {
  // ring index = rank of this laser's elevation
  int r = 0;
  for (int j = 0; j < kLasers; ++j)
    if (vert[j] < vert[laser] || (vert[j] == vert[laser] && j < laser)) ++r;
  return r;
}

}  // namespace

extern "C" {

// packets: n * 1206 uint8. Outputs are n*12*32 flat arrays.
int decode_packets(const uint8_t* packets, int n, float dist_res,
                   float min_range, float max_range, const float* vert_deg,
                   float* x, float* y, float* z, float* intensity,
                   int32_t* ring, float* time_us, uint8_t* valid) {
  const AzimuthLut& t = lut();
  float sin_el[kLasers], cos_el[kLasers];
  int ring_map[kLasers];
  for (int l = 0; l < kLasers; ++l) {
    double e = vert_deg[l] * M_PI / 180.0;
    sin_el[l] = static_cast<float>(std::sin(e));
    cos_el[l] = static_cast<float>(std::cos(e));
    ring_map[l] = ring_of_laser(vert_deg, l);
  }

  for (int p = 0; p < n; ++p) {
    const uint8_t* pkt = packets + p * kPacketSize;
    // block azimuths
    uint16_t flags[kBlocks];
    float az[kBlocks];
    for (int b = 0; b < kBlocks; ++b) {
      const uint8_t* blk = pkt + b * 100;
      flags[b] = static_cast<uint16_t>(blk[0] | (blk[1] << 8));
      az[b] = static_cast<float>(blk[2] | (blk[3] << 8)) / 100.0f;
    }
    for (int b = 0; b < kBlocks; ++b) {
      const uint8_t* blk = pkt + b * 100 + 4;
      float az_next = (b + 1 < kBlocks)
                          ? az[b + 1]
                          : az[b] + std::fmod(az[b] - az[b - 1] + 360.0f, 360.0f);
      float az_diff = std::fmod(az_next - az[b] + 360.0f, 360.0f);
      bool flag_ok = flags[b] == kBlockFlag;
      for (int c = 0; c < kChannels; ++c) {
        int laser = c % kLasers;
        bool firing2 = c >= kLasers;
        float a = az[b] + (firing2 ? az_diff * 0.5f : 0.0f);
        a = std::fmod(a + 360.0f, 360.0f);
        int ai = std::min(35999, std::max(0, static_cast<int>(a * 100.0f)));

        uint16_t raw =
            static_cast<uint16_t>(blk[c * 3] | (blk[c * 3 + 1] << 8));
        float d = raw * dist_res;
        size_t o = (static_cast<size_t>(p) * kBlocks + b) * kChannels + c;
        float ce = cos_el[laser];
        x[o] = d * ce * t.sin_t[ai];
        y[o] = d * ce * t.cos_t[ai];
        z[o] = d * sin_el[laser];
        intensity[o] = static_cast<float>(blk[c * 3 + 2]);
        ring[o] = ring_map[laser];
        time_us[o] = (b * 2 + (firing2 ? 1 : 0)) * kFiringCycleUs +
                     laser * kSingleFiringUs;
        valid[o] = (flag_ok && d >= min_range && d <= max_range) ? 1 : 0;
      }
    }
  }
  return n * kBlocks * kChannels;
}

// ---------------------------------------------------------------------------
// pcap replay (InputPCAP role). Parses classic pcap files without libpcap:
// 24-byte global header, then per-record [ts_sec, ts_usec, incl_len,
// orig_len] + data; the UDP payload of a 1248-byte Ethernet frame starts at
// offset 42. Returns number of packets extracted (up to max_packets).
int pcap_read_packets(const char* path, uint8_t* out, double* stamps,
                      int max_packets) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  uint8_t ghdr[24];
  if (std::fread(ghdr, 1, 24, f) != 24) {
    std::fclose(f);
    return -1;
  }
  uint32_t magic;
  std::memcpy(&magic, ghdr, 4);
  bool swapped;
  if (magic == 0xa1b2c3d4)
    swapped = false;
  else if (magic == 0xd4c3b2a1)
    swapped = true;
  else {
    std::fclose(f);
    return -2;  // not a classic pcap
  }
  auto rd32 = [&](const uint8_t* p) {
    uint32_t v;
    std::memcpy(&v, p, 4);
    return swapped ? __builtin_bswap32(v) : v;
  };

  int count = 0;
  std::vector<uint8_t> buf(65536);
  while (count < max_packets) {
    uint8_t rhdr[16];
    if (std::fread(rhdr, 1, 16, f) != 16) break;
    uint32_t ts_sec = rd32(rhdr);
    uint32_t ts_usec = rd32(rhdr + 4);
    uint32_t incl = rd32(rhdr + 8);
    if (incl > buf.size()) {
      std::fclose(f);
      return -3;
    }
    if (std::fread(buf.data(), 1, incl, f) != incl) break;
    if (incl >= 42 + kPacketSize) {
      std::memcpy(out + static_cast<size_t>(count) * kPacketSize,
                  buf.data() + 42, kPacketSize);
      stamps[count] = ts_sec + ts_usec * 1e-6;
      ++count;
    }
  }
  std::fclose(f);
  return count;
}

// ---------------------------------------------------------------------------
// live UDP capture (InputSocket role)
int udp_open(int port, int rcvbuf_bytes) {
  int fd = ::socket(AF_INET, SOCK_DGRAM, 0);
  if (fd < 0) return -1;
  int one = 1;
  ::setsockopt(fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  if (rcvbuf_bytes > 0)
    ::setsockopt(fd, SOL_SOCKET, SO_RCVBUF, &rcvbuf_bytes, sizeof(rcvbuf_bytes));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = INADDR_ANY;
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (::bind(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) < 0) {
    ::close(fd);
    return -2;
  }
  int flags = ::fcntl(fd, F_GETFL, 0);
  ::fcntl(fd, F_SETFL, flags | O_NONBLOCK);
  return fd;
}

// poll()-guarded batch receive (input.cc:131-190); returns packets received.
int udp_recv_batch(int fd, uint8_t* out, int max_packets, int timeout_ms) {
  int count = 0;
  while (count < max_packets) {
    pollfd pfd{fd, POLLIN, 0};
    int pr = ::poll(&pfd, 1, timeout_ms);
    if (pr <= 0) break;
    ssize_t n = ::recv(fd, out + static_cast<size_t>(count) * kPacketSize,
                       kPacketSize, 0);
    if (n == kPacketSize) ++count;
    // short/oversize datagrams are dropped, like the reference's size check
  }
  return count;
}

void udp_close(int fd) { ::close(fd); }

// ---------------------------------------------------------------------------
// lock-free SPSC ring buffer of packets (driver thread -> consumer)
struct PacketRing {
  std::vector<uint8_t> data;
  std::vector<double> stamps;
  size_t capacity;
  std::atomic<size_t> head{0}, tail{0};
};

void* ring_create(int capacity) {
  auto* r = new PacketRing();
  r->capacity = static_cast<size_t>(capacity);
  r->data.resize(r->capacity * kPacketSize);
  r->stamps.resize(r->capacity);
  return r;
}

int ring_push(void* ring, const uint8_t* pkt, double stamp) {
  auto* r = static_cast<PacketRing*>(ring);
  size_t h = r->head.load(std::memory_order_relaxed);
  size_t t = r->tail.load(std::memory_order_acquire);
  if (h - t >= r->capacity) return 0;  // full -> drop (bounded queue)
  std::memcpy(&r->data[(h % r->capacity) * kPacketSize], pkt, kPacketSize);
  r->stamps[h % r->capacity] = stamp;
  r->head.store(h + 1, std::memory_order_release);
  return 1;
}

int ring_pop_batch(void* ring, uint8_t* out, double* stamps, int max_packets) {
  auto* r = static_cast<PacketRing*>(ring);
  size_t t = r->tail.load(std::memory_order_relaxed);
  size_t h = r->head.load(std::memory_order_acquire);
  int count = 0;
  while (t < h && count < max_packets) {
    std::memcpy(out + static_cast<size_t>(count) * kPacketSize,
                &r->data[(t % r->capacity) * kPacketSize], kPacketSize);
    stamps[count] = r->stamps[t % r->capacity];
    ++t;
    ++count;
  }
  r->tail.store(t, std::memory_order_release);
  return count;
}

int ring_size(void* ring) {
  auto* r = static_cast<PacketRing*>(ring);
  return static_cast<int>(r->head.load() - r->tail.load());
}

void ring_destroy(void* ring) { delete static_cast<PacketRing*>(ring); }

}  // extern "C"

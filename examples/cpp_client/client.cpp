// yolo_tpu C++ runtime client.
//
// Native deployment consumer of the TPU serving daemon (yolo_tpu/serve.py) —
// the TPU-era equivalent of the reference's per-engine C++ examples
// (ref: examples/YOLOv8-CPP-Inference, YOLOv8-ONNXRuntime-CPP,
// YOLO11-Triton-CPP): instead of linking an inference engine per format, the
// client streams raw BGR frames over a length-prefixed TCP protocol and
// receives fixed-layout detections; the chip stays owned by one serving
// process that batches across clients.
//
// Protocol v2 (little-endian):
//   request:  'YTP2' | u16 version(=2) | u16 model_id
//             | u32 h | u32 w | u32 c | u8[h*w*c] BGR
//   response: 'YTPR' | u16 version | u16 status(0=ok)
//             | u32 n | n x (f32 x1,y1,x2,y2,conf,cls)
//             status!=0 -> u32 len | utf-8 message
// (the server also accepts the legacy v1 'YTPU' framing)
//
// Usage: ./yolo_client [host] [port] [n_frames] [model_id]
//   Sends synthetic IR-style frames with a moving bright target and prints the
//   detections; for real use, replace make_frame() with your capture source.

#include <arpa/inet.h>
#include <netinet/in.h>
#include <sys/socket.h>
#include <unistd.h>

#include <chrono>
#include <cstdint>
#include <cstring>
#include <iostream>
#include <stdexcept>
#include <string>
#include <vector>

namespace {

constexpr int kH = 512, kW = 640, kC = 3;

struct Detection {
  float x1, y1, x2, y2, conf, cls;
};

void send_all(int fd, const void* data, size_t n) {
  const char* p = static_cast<const char*>(data);
  while (n > 0) {
    ssize_t k = ::send(fd, p, n, 0);
    if (k <= 0) throw std::runtime_error("send failed");
    p += k;
    n -= k;
  }
}

void recv_all(int fd, void* data, size_t n) {
  char* p = static_cast<char*>(data);
  while (n > 0) {
    ssize_t k = ::recv(fd, p, n, 0);
    if (k <= 0) throw std::runtime_error("recv failed");
    p += k;
    n -= k;
  }
}

// Synthetic IR frame: dim noise + one bright small target moving left->right.
std::vector<uint8_t> make_frame(int t) {
  std::vector<uint8_t> img(kH * kW * kC);
  uint32_t s = 12345 + t;
  for (size_t i = 0; i < img.size(); i += kC) {
    s = s * 1664525u + 1013904223u;  // LCG noise
    uint8_t v = 20 + (s >> 28);
    img[i] = img[i + 1] = img[i + 2] = v;
  }
  const int cx = (40 + 4 * t) % kW, cy = 250;
  for (int y = cy - 4; y < cy + 4; ++y)
    for (int x = cx - 5; x < cx + 5; ++x)
      if (x >= 0 && x < kW && y >= 0 && y < kH)
        for (int k = 0; k < kC; ++k) img[(y * kW + x) * kC + k] = 235;
  return img;
}

std::vector<Detection> detect(int fd, const std::vector<uint8_t>& frame, uint16_t model_id) {
  const uint16_t version = 2;
  uint32_t geom[3] = {kH, kW, kC};
  send_all(fd, "YTP2", 4);
  send_all(fd, &version, 2);
  send_all(fd, &model_id, 2);
  send_all(fd, geom, sizeof(geom));
  send_all(fd, frame.data(), frame.size());

  char magic[4];
  recv_all(fd, magic, 4);
  if (std::memcmp(magic, "YTPR", 4) != 0) throw std::runtime_error("bad response magic");
  uint16_t ver = 0, status = 0;
  recv_all(fd, &ver, 2);
  recv_all(fd, &status, 2);
  uint32_t n = 0;
  recv_all(fd, &n, 4);
  if (status != 0) {
    std::string msg(n, '\0');
    if (n) recv_all(fd, msg.data(), n);
    throw std::runtime_error("server error " + std::to_string(status) + ": " + msg);
  }
  std::vector<Detection> dets(n);
  if (n) recv_all(fd, dets.data(), n * sizeof(Detection));
  return dets;
}

}  // namespace

int main(int argc, char** argv) {
  const std::string host = argc > 1 ? argv[1] : "127.0.0.1";
  const int port = argc > 2 ? std::atoi(argv[2]) : 8777;
  const int n_frames = argc > 3 ? std::atoi(argv[3]) : 16;
  const uint16_t model_id = argc > 4 ? static_cast<uint16_t>(std::atoi(argv[4])) : 0;

  int fd = ::socket(AF_INET, SOCK_STREAM, 0);
  if (fd < 0) { std::cerr << "socket() failed\n"; return 1; }
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons(port);
  if (inet_pton(AF_INET, host.c_str(), &addr.sin_addr) != 1) { std::cerr << "bad host\n"; return 1; }
  if (::connect(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0) {
    std::cerr << "connect to " << host << ":" << port << " failed\n";
    return 1;
  }

  auto t0 = std::chrono::steady_clock::now();
  int total = 0;
  for (int t = 0; t < n_frames; ++t) {
    auto dets = detect(fd, make_frame(t), model_id);
    total += static_cast<int>(dets.size());
    std::cout << "frame " << t << ": " << dets.size() << " detections";
    for (const auto& d : dets)
      std::cout << "  [" << d.x1 << "," << d.y1 << "," << d.x2 << "," << d.y2
                << " conf=" << d.conf << " cls=" << d.cls << "]";
    std::cout << "\n";
  }
  auto dt = std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();
  std::cout << n_frames << " frames in " << dt << "s (" << n_frames / dt << " fps), "
            << total << " detections total\n";
  ::close(fd);
  return 0;
}

// Native detector: PJRT C API session over a yolo_tpu StableHLO export,
// plus the C++ postprocessing (confidence filter, NMS, letterbox inverse)
// a standalone deployment needs when consuming the RAW prediction export.
//
// Native counterpart of yolo_tpu/engine/predictor.py's fused program
// (ref counterparts: examples/YOLOv8-CPP-Inference/inference.{h,cpp} — OpenCV
// DNN session + C++ NMS; examples/YOLOv8-ONNXRuntime-CPP/inference.cpp — ORT
// session with its own postprocess).
//
// Two export flavors are handled:
//   * nms=True exports (4 outputs: boxes/scores/cls/valid) — postprocess
//     happened on-device; we only read the valid slots.
//   * raw exports (1 output: (1, 4+nc, A) xywh + class scores) — confidence
//     filter, xywh->xyxy and greedy IoU NMS run here in C++.

#pragma once

#include <cstdint>
#include <memory>
#include <string>
#include <vector>

#include "tracker.h"  // Detection / BBox

namespace yolo_tpu {

struct LetterboxInfo {
  float ratio = 1.0f;  // source -> network scale
  float dx = 0.0f;     // horizontal pad (may be fractional, center placement)
  float dy = 0.0f;     // vertical pad
};

// Bilinear letterbox (cv2.INTER_LINEAR half-pixel sampling, 114 gray pad,
// centered) from an h x w x 3 uint8 frame into dh x dw x 3.
LetterboxInfo LetterboxU8(const uint8_t* src, int h, int w, uint8_t* dst,
                          int dh, int dw, uint8_t pad_value = 114);

// Map network-space xyxy boxes back to source-image coordinates
// (yolo_tpu/ops/boxes.py scale_boxes inverse; clips to the source frame).
void ScaleBoxes(std::vector<Detection>* dets, const LetterboxInfo& lb,
                int src_h, int src_w);

// Greedy IoU NMS (score-descending, strict > threshold — identical keep-set
// to the framework's fixed-shape NMS / torchvision).
std::vector<Detection> NmsGreedy(std::vector<Detection> dets,
                                 double iou_threshold, int max_det);

// Decode a raw (1, 4+nc, A) prediction tensor: per-anchor best-class
// confidence filter, xywh -> xyxy. Boxes stay in network space.
std::vector<Detection> DecodeRawPredictions(const float* preds, int channels,
                                            int anchors, double conf_threshold);

class PjrtDetector {
 public:
  // Loads the PJRT plugin (dlopen), creates a client (axon-TPU defaults, or
  // --no-default-opts semantics when `default_opts` is false) and compiles
  // the .mlir module (weights baked in, one uint8 NHWC argument).
  PjrtDetector(const std::string& plugin_path, const std::string& module_path,
               bool default_opts = true);
  ~PjrtDetector();
  PjrtDetector(const PjrtDetector&) = delete;
  PjrtDetector& operator=(const PjrtDetector&) = delete;

  // Input geometry parsed from the exporter's sidecar json (b, h, w, c).
  int input_h() const;
  int input_w() const;

  // Run one uint8 NHWC frame already sized to (input_h, input_w, 3).
  // Detections are in network space; caller applies ScaleBoxes.
  std::vector<Detection> Detect(const uint8_t* frame, double conf_threshold,
                                double iou_threshold, int max_det);

 private:
  struct Impl;
  std::unique_ptr<Impl> impl_;
};

}  // namespace yolo_tpu

// Native IR aircraft detect+track pipeline.
//
// C++ counterpart of yolo_tpu/kalman/pipeline.py (ref:
// kalman/aircraft_detection_tracking.py): YOLO detections feed the
// EnhancedMultiTargetTracker; per-frame state-switch accounting and the
// final detected/predicted/switch statistics match the Python pipeline.
//
// Two modes:
//
//   1. Offline tracker mode (no TPU; the golden-parity test path):
//        cpp_detect_track --dets detections.csv --out tracks.csv
//      detections.csv rows: frame,x1,y1,x2,y2,conf  (frame is 1-based).
//
//   2. Full native pipeline (PJRT on the exported StableHLO module):
//        cpp_detect_track --module model.mlir --video frames.u8 \
//            --src-h 512 --src-w 640 [--plugin libfoo.so] [--out tracks.csv]
//      frames.u8 = concatenated raw RGB uint8 frames (src-h x src-w x 3).
//      Each frame is letterboxed in C++, run through PJRT, postprocessed
//      (conf filter + NMS for raw exports), scaled back and tracked.
//
// Tracker configuration mirrors the reference application defaults
// (max_lost_frames=150, min_hits=1, iou_threshold=0.1, conf>0.1 —
// ref: kalman/aircraft_detection_tracking.py:48-52,99-106).

#include <algorithm>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <map>
#include <sstream>
#include <string>
#include <vector>

#include "detector.h"
#include "tracker.h"

namespace {

using yolo_tpu::Detection;
using yolo_tpu::TrackInfo;

struct Args {
  std::string dets_csv;
  std::string module;
  std::string plugin;
  std::string video;
  std::string out_csv;
  int src_h = 512, src_w = 640;
  int max_frames = 0;
  int max_lost = 150;
  int min_hits = 1;
  double iou_track = 0.1;
  double conf = 0.1;
  double iou_nms = 0.45;
  int max_det = 300;
  bool default_opts = true;
};

[[noreturn]] void Usage(const char* argv0) {
  std::fprintf(stderr,
               "usage: %s (--dets D.csv | --module M.mlir --video F.u8 "
               "--src-h H --src-w W)\n"
               "          [--out tracks.csv] [--plugin P.so] [--no-default-opts]\n"
               "          [--max-frames N] [--max-lost 150] [--min-hits 1]\n"
               "          [--iou-track 0.1] [--conf 0.1] [--iou-nms 0.45]\n",
               argv0);
  std::exit(2);
}

Args ParseArgs(int argc, char** argv) {
  Args a;
  for (int i = 1; i < argc; ++i) {
    const std::string k = argv[i];
    auto next = [&]() -> std::string {
      if (i + 1 >= argc) Usage(argv[0]);
      return argv[++i];
    };
    if (k == "--dets") a.dets_csv = next();
    else if (k == "--module") a.module = next();
    else if (k == "--plugin") a.plugin = next();
    else if (k == "--video") a.video = next();
    else if (k == "--out") a.out_csv = next();
    else if (k == "--src-h") a.src_h = std::atoi(next().c_str());
    else if (k == "--src-w") a.src_w = std::atoi(next().c_str());
    else if (k == "--max-frames") a.max_frames = std::atoi(next().c_str());
    else if (k == "--max-lost") a.max_lost = std::atoi(next().c_str());
    else if (k == "--min-hits") a.min_hits = std::atoi(next().c_str());
    else if (k == "--iou-track") a.iou_track = std::atof(next().c_str());
    else if (k == "--conf") a.conf = std::atof(next().c_str());
    else if (k == "--iou-nms") a.iou_nms = std::atof(next().c_str());
    else if (k == "--max-det") a.max_det = std::atoi(next().c_str());
    else if (k == "--no-default-opts") a.default_opts = false;
    else Usage(argv[0]);
  }
  if (a.dets_csv.empty() && (a.module.empty() || a.video.empty())) Usage(argv[0]);
  return a;
}

// detections.csv -> per-frame detection lists (1-based frame index).
std::map<int, std::vector<Detection>> LoadDetections(const std::string& path,
                                                     int* max_frame) {
  std::ifstream f(path);
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", path.c_str());
    std::exit(1);
  }
  std::map<int, std::vector<Detection>> by_frame;
  std::string line;
  while (std::getline(f, line)) {
    if (line.empty() || line[0] == '#' || line.rfind("frame", 0) == 0) continue;
    std::istringstream ss(line);
    std::string tok;
    std::vector<double> vals;
    while (std::getline(ss, tok, ',')) vals.push_back(std::atof(tok.c_str()));
    if (vals.size() < 6) continue;
    const int frame = static_cast<int>(vals[0]);
    by_frame[frame].push_back({{vals[1], vals[2], vals[3], vals[4]}, vals[5]});
    *max_frame = std::max(*max_frame, frame);
  }
  return by_frame;
}

void WriteTrackRow(std::ofstream& out, int frame, const TrackInfo& t) {
  out << frame << ',' << t.track_id << ',' << t.status << ',';
  char buf[200];
  std::snprintf(buf, sizeof(buf),
                "%.6f,%.6f,%.6f,%.6f,%.6f,%d,%d,%d,%.6f",
                t.bbox[0], t.bbox[1], t.bbox[2], t.bbox[3], t.confidence,
                t.hits, t.hit_streak, t.time_since_update, t.motion_confidence);
  out << buf << '\n';
}

}  // namespace

int main(int argc, char** argv) {
  const Args args = ParseArgs(argc, argv);

  yolo_tpu::EnhancedMultiTargetTracker tracker(args.max_lost, args.min_hits,
                                               args.iou_track);

  std::ofstream out_csv;
  if (!args.out_csv.empty()) {
    out_csv.open(args.out_csv);
    out_csv << "frame,track_id,status,x1,y1,x2,y2,confidence,hits,hit_streak,"
               "time_since_update,motion_confidence\n";
  }

  // detection source: CSV replay or the PJRT detector over raw frames
  std::map<int, std::vector<Detection>> csv_dets;
  int total_frames = args.max_frames;
  std::unique_ptr<yolo_tpu::PjrtDetector> detector;
  std::ifstream video;
  std::vector<uint8_t> frame_buf, net_buf;
  yolo_tpu::LetterboxInfo lb;

  if (!args.dets_csv.empty()) {
    int max_frame = 0;
    csv_dets = LoadDetections(args.dets_csv, &max_frame);
    if (total_frames == 0) total_frames = max_frame;
  } else {
    const char* env_plugin = std::getenv("PJRT_PLUGIN");
    std::string plugin = !args.plugin.empty() ? args.plugin
                         : env_plugin         ? env_plugin
                                              : "/opt/axon/libaxon_pjrt.so";
    detector.reset(new yolo_tpu::PjrtDetector(plugin, args.module, args.default_opts));
    video.open(args.video, std::ios::binary);
    if (!video) {
      std::fprintf(stderr, "cannot open %s\n", args.video.c_str());
      return 1;
    }
    frame_buf.resize(static_cast<size_t>(args.src_h) * args.src_w * 3);
    net_buf.resize(static_cast<size_t>(detector->input_h()) * detector->input_w() * 3);
  }

  // pipeline loop with state-switch accounting
  // (yolo_tpu/kalman/pipeline.py:96-150; ref :111-131)
  int frame_count = 0;
  int detection_frames = 0, prediction_frames = 0, state_changes = 0;
  std::map<std::string, std::string> last_states;

  while (true) {
    if (total_frames && frame_count >= total_frames) break;

    std::vector<Detection> detections;
    if (detector) {
      if (!video.read(reinterpret_cast<char*>(frame_buf.data()),
                      static_cast<std::streamsize>(frame_buf.size())))
        break;
      lb = yolo_tpu::LetterboxU8(frame_buf.data(), args.src_h, args.src_w,
                                 net_buf.data(), detector->input_h(),
                                 detector->input_w());
      detections = detector->Detect(net_buf.data(), args.conf, args.iou_nms,
                                    args.max_det);
      yolo_tpu::ScaleBoxes(&detections, lb, args.src_h, args.src_w);
    } else {
      auto it = csv_dets.find(frame_count + 1);
      if (it != csv_dets.end()) detections = it->second;
    }
    ++frame_count;

    // conf > threshold filter (strict >, ref :99-106)
    std::vector<Detection> filtered;
    for (const auto& d : detections)
      if (d.conf > args.conf) filtered.push_back(d);

    const auto tracks = tracker.Update(filtered);

    std::map<std::string, std::string> current_states;
    for (const auto& t : tracks) {
      current_states[t.track_id] = t.status;
      auto prev = last_states.find(t.track_id);
      if (prev != last_states.end() && prev->second != t.status) {
        ++state_changes;
        std::printf("frame %d: target %s %s -> %s\n", frame_count,
                    t.track_id.c_str(), prev->second.c_str(), t.status.c_str());
      }
      if (t.status == "detected") ++detection_frames;
      else if (t.status == "predicted") ++prediction_frames;
      if (out_csv.is_open()) WriteTrackRow(out_csv, frame_count, t);
    }
    last_states = std::move(current_states);

    if (frame_count % 50 == 0) {
      std::printf("progress: %d frames\n", frame_count);
      std::printf("  detection frames: %d, prediction frames: %d\n",
                  detection_frames, prediction_frames);
      std::printf("  state changes: %d\n", state_changes);
    }
  }

  const int total_states = detection_frames + prediction_frames;
  if (total_states) {
    std::printf(
        "done: %d frames; detected %d (%.1f%%) / predicted %d (%.1f%%); %d "
        "state switches\n",
        frame_count, detection_frames, 100.0 * detection_frames / total_states,
        prediction_frames, 100.0 * prediction_frames / total_states,
        state_changes);
  } else {
    std::printf("done: %d frames; no confirmed tracks\n", frame_count);
  }
  return 0;
}

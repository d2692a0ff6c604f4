// Native C++ port of the IR aircraft Kalman tracking stack.
//
// Behavioral parity with yolo_tpu/kalman/{tracker.py,multi_tracker.py}, which
// are themselves parity twins of the reference application layer
// (ref: kalman/enhanced_aircraft_kalman_tracker.py AircraftKalmanTracker,
//  ref: kalman/enhanced_multi_target_tracker.py EnhancedMultiTargetTracker).
//
// This gives a TPU deployment a fully native detect+track loop: PJRT runs the
// exported StableHLO detector (see detector.h) and this tracker consumes the
// boxes — no Python in the serving path. The golden parity test
// (tests/test_cpp_detect_track.py) drives both this port and the Python
// tracker with identical detection streams and compares track IDs, states,
// boxes and statistics.

#pragma once

#include <array>
#include <cstdint>
#include <deque>
#include <memory>
#include <string>
#include <vector>

namespace yolo_tpu {

// [x1, y1, x2, y2]
using BBox = std::array<double, 4>;

// Port of AircraftKalmanTracker.get_track_info()'s dict.
struct TrackInfo {
  std::string track_id;
  BBox bbox{};
  double confidence = 0.0;
  std::string status;  // "detected" | "predicted"
  int age = 0;
  int hits = 0;
  int hit_streak = 0;
  int time_since_update = 0;
  int lost_frames = 0;  // := time_since_update (reference quirk)
  bool is_lost = false;  // := time_since_update > 0 (reference quirk)
  std::vector<std::array<double, 2>> trajectory;  // last 30 centers
  std::array<double, 2> velocity{};
  double motion_confidence = 0.0;
  bool is_stable_motion = false;
  double speed = 0.0;
  double direction = 0.0;
};

// 8-state constant-velocity Kalman tracker with motion-pattern analysis and
// confidence-decayed long-term extrapolation while lost.
// State: [cx, cy, w, h, vx, vy, vw, vh]; measurement: [cx, cy, w, h].
class AircraftKalmanTracker {
 public:
  static constexpr int kStateDim = 8;
  static constexpr int kMeasDim = 4;

  AircraftKalmanTracker(const BBox& initial_bbox, std::string track_id,
                        int max_lost_frames = 450);

  // Kalman time update; returns the predicted bbox.
  BBox Predict();
  // Kalman measurement update with motion-history bookkeeping.
  void Update(const BBox& bbox);
  // Extrapolate `frames_ahead` frames from the learned motion pattern.
  // NOTE (reference parity): frames_ahead <= 1 falls through to Predict(),
  // permanently advancing the filter — a side effect the reference has too.
  std::pair<BBox, double> EnhancedLongTermPredict(int frames_ahead);
  void MarkAsLost();
  std::pair<BBox, double> GetLostPrediction();
  TrackInfo GetTrackInfo() const;
  bool ShouldDelete(int max_lost_frames) const;

  const std::string& track_id() const { return track_id_; }
  bool is_lost() const { return is_lost_; }
  int age() const { return age_; }
  int hits() const { return hits_; }
  int hit_streak() const { return hit_streak_; }
  int lost_frames() const { return lost_frames_; }
  int time_since_update() const { return time_since_update_; }
  double prediction_confidence() const { return motion_.prediction_confidence; }

 private:
  struct MotionAnalysis {
    std::array<double, 2> velocity_avg{0.0, 0.0};
    std::array<double, 2> velocity_std{0.0, 0.0};
    double direction = 0.0;
    double speed = 0.0;
    double stability_score = 0.0;
    double prediction_confidence = 0.0;
  };

  void AnalyzeMotionPattern();
  double DirectionConsistency() const;
  std::pair<BBox, double> LongTermFromPattern(int frames_ahead) const;

  std::string track_id_;
  int age_ = 0;
  int hits_ = 1;
  int hit_streak_ = 1;
  int time_since_update_ = 0;

  // Row-major filter matrices / state (double, matching numpy float64).
  std::array<double, kStateDim> x_{};
  std::array<double, kStateDim * kStateDim> P_{};

  std::deque<std::array<double, 2>> trajectory_history_;  // maxlen 150
  std::deque<std::array<double, 2>> velocity_history_;    // maxlen 50
  std::deque<std::array<double, 2>> position_history_;    // maxlen 100

  MotionAnalysis motion_;

  bool is_lost_ = false;
  int lost_frames_ = 0;
  int max_lost_frames_ = 450;
};

// Detection: [x1, y1, x2, y2] + confidence.
struct Detection {
  BBox bbox{};
  double conf = 0.0;
};

// Greedy-IoU multi-target manager over AircraftKalmanTracker instances.
class EnhancedMultiTargetTracker {
 public:
  struct Stats {
    int total_tracks_created = 0;
    int total_tracks_terminated = 0;
    int current_active_tracks = 0;
    int long_term_predictions = 0;
    int successful_recoveries = 0;
  };

  EnhancedMultiTargetTracker(int max_lost_frames = 450, int min_hits = 3,
                             double iou_threshold = 0.3);

  // One tracking step: predict-all -> greedy IoU associate -> update /
  // mark-lost / create / delete -> confirmed tracks.
  std::vector<TrackInfo> Update(const std::vector<Detection>& detections);

  const Stats& stats() const { return stats_; }
  int frame_count() const { return frame_count_; }
  size_t num_trackers() const { return trackers_.size(); }

 private:
  struct Match {
    int det;
    int trk;
  };
  // Greedy assignment by descending IoU (ties resolved by candidate order,
  // matching np.argsort on distinct values).
  std::vector<Match> Associate(const std::vector<Detection>& detections,
                               const std::vector<BBox>& predicted,
                               std::vector<int>* unmatched_dets,
                               std::vector<int>* unmatched_trks) const;
  void PrintStatistics() const;

  std::vector<std::unique_ptr<AircraftKalmanTracker>> trackers_;
  int max_lost_frames_;
  int min_hits_;
  double iou_threshold_;
  int frame_count_ = 0;
  int next_track_id_ = 1;
  Stats stats_;
};

double IoUXYXY(const BBox& a, const BBox& b);

}  // namespace yolo_tpu

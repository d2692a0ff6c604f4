// Implementation of the native Kalman detect+track stack. See tracker.h.
//
// Math parity notes: every filter constant and update equation mirrors
// yolo_tpu/kalman/tracker.py (itself the reference's
// kalman/enhanced_aircraft_kalman_tracker.py). All arithmetic is double
// (numpy float64); matmuls are plain triple loops — at 8x8 the summation-order
// difference vs BLAS is below 1e-12 relative and the parity test allows it.

#include "tracker.h"

#include <algorithm>
#include <cmath>
#include <cstdio>

namespace yolo_tpu {

namespace {

constexpr int N = AircraftKalmanTracker::kStateDim;   // 8
constexpr int M = AircraftKalmanTracker::kMeasDim;    // 4

using Vec8 = std::array<double, N>;
using Mat8 = std::array<double, N * N>;
using Mat4 = std::array<double, M * M>;

// F: identity + unit dt velocity coupling (x += vx etc.).
Mat8 MakeF() {
  Mat8 F{};
  for (int i = 0; i < N; ++i) F[i * N + i] = 1.0;
  F[0 * N + 4] = F[1 * N + 5] = F[2 * N + 6] = F[3 * N + 7] = 1.0;
  return F;
}

// Q: process noise (same block values as the reference).
Mat8 MakeQ() {
  Mat8 Q{};
  Q[0 * N + 0] = Q[1 * N + 1] = 0.1;    // position
  Q[2 * N + 2] = Q[3 * N + 3] = 0.01;   // size
  Q[4 * N + 4] = Q[5 * N + 5] = 0.1;    // velocity
  Q[6 * N + 6] = Q[7 * N + 7] = 0.001;  // size velocity
  return Q;
}

Mat8 MakeP0() {
  Mat8 P{};
  P[0 * N + 0] = P[1 * N + 1] = P[2 * N + 2] = P[3 * N + 3] = 50.0;
  P[4 * N + 4] = P[5 * N + 5] = 100.0;
  P[6 * N + 6] = P[7 * N + 7] = 1.0;
  return P;
}

const Mat8 kF = MakeF();
const Mat8 kQ = MakeQ();
constexpr double kRMeas = 10.0;  // R = 10 * I4

std::array<double, 4> BBoxToCxcywh(const BBox& b) {
  return {(b[0] + b[2]) / 2.0, (b[1] + b[3]) / 2.0, b[2] - b[0], b[3] - b[1]};
}

BBox StateToBBox(const double* s) {
  return {s[0] - s[2] / 2.0, s[1] - s[3] / 2.0, s[0] + s[2] / 2.0, s[1] + s[3] / 2.0};
}

// out = A @ B for 8x8 row-major.
Mat8 MatMul8(const Mat8& A, const Mat8& B) {
  Mat8 out{};
  for (int i = 0; i < N; ++i)
    for (int k = 0; k < N; ++k) {
      const double a = A[i * N + k];
      if (a == 0.0) continue;
      for (int j = 0; j < N; ++j) out[i * N + j] += a * B[k * N + j];
    }
  return out;
}

Vec8 MatVec8(const Mat8& A, const Vec8& v) {
  Vec8 out{};
  for (int i = 0; i < N; ++i) {
    double s = 0.0;
    for (int j = 0; j < N; ++j) s += A[i * N + j] * v[j];
    out[i] = s;
  }
  return out;
}

// Gauss-Jordan inverse of a 4x4 (S is SPD and well-conditioned here; partial
// pivoting for safety).
Mat4 Inv4(Mat4 a) {
  Mat4 inv{};
  for (int i = 0; i < M; ++i) inv[i * M + i] = 1.0;
  for (int col = 0; col < M; ++col) {
    int piv = col;
    for (int r = col + 1; r < M; ++r)
      if (std::fabs(a[r * M + col]) > std::fabs(a[piv * M + col])) piv = r;
    if (piv != col) {
      for (int j = 0; j < M; ++j) {
        std::swap(a[col * M + j], a[piv * M + j]);
        std::swap(inv[col * M + j], inv[piv * M + j]);
      }
    }
    const double d = a[col * M + col];
    for (int j = 0; j < M; ++j) {
      a[col * M + j] /= d;
      inv[col * M + j] /= d;
    }
    for (int r = 0; r < M; ++r) {
      if (r == col) continue;
      const double f = a[r * M + col];
      if (f == 0.0) continue;
      for (int j = 0; j < M; ++j) {
        a[r * M + j] -= f * a[col * M + j];
        inv[r * M + j] -= f * inv[col * M + j];
      }
    }
  }
  return inv;
}

// Population std (np.std default, ddof=0).
double StdDev(const std::vector<double>& v) {
  if (v.empty()) return 0.0;
  double mean = 0.0;
  for (double x : v) mean += x;
  mean /= v.size();
  double var = 0.0;
  for (double x : v) var += (x - mean) * (x - mean);
  return std::sqrt(var / v.size());
}

void PushMax(std::deque<std::array<double, 2>>& dq, std::array<double, 2> v,
             size_t maxlen) {
  dq.push_back(v);
  if (dq.size() > maxlen) dq.pop_front();
}

}  // namespace

double IoUXYXY(const BBox& a, const BBox& b) {
  const double ix1 = std::max(a[0], b[0]), iy1 = std::max(a[1], b[1]);
  const double ix2 = std::min(a[2], b[2]), iy2 = std::min(a[3], b[3]);
  if (ix2 <= ix1 || iy2 <= iy1) return 0.0;
  const double inter = (ix2 - ix1) * (iy2 - iy1);
  const double ua = (a[2] - a[0]) * (a[3] - a[1]);
  const double ub = (b[2] - b[0]) * (b[3] - b[1]);
  const double uni = ua + ub - inter;
  return uni > 0.0 ? inter / uni : 0.0;
}

// ---- AircraftKalmanTracker --------------------------------------------------

AircraftKalmanTracker::AircraftKalmanTracker(const BBox& initial_bbox,
                                             std::string track_id,
                                             int max_lost_frames)
    : track_id_(std::move(track_id)), max_lost_frames_(max_lost_frames) {
  P_ = MakeP0();
  const auto z0 = BBoxToCxcywh(initial_bbox);
  for (int i = 0; i < M; ++i) x_[i] = z0[i];
  PushMax(trajectory_history_, {z0[0], z0[1]}, 150);
  PushMax(position_history_, {z0[0], z0[1]}, 100);
}

void AircraftKalmanTracker::AnalyzeMotionPattern() {
  if (velocity_history_.size() < 5) return;
  std::vector<double> vx, vy;
  vx.reserve(velocity_history_.size());
  vy.reserve(velocity_history_.size());
  for (const auto& v : velocity_history_) {
    vx.push_back(v[0]);
    vy.push_back(v[1]);
  }
  double mx = 0.0, my = 0.0;
  for (size_t i = 0; i < vx.size(); ++i) {
    mx += vx[i];
    my += vy[i];
  }
  mx /= vx.size();
  my /= vy.size();
  motion_.velocity_avg = {mx, my};
  motion_.velocity_std = {StdDev(vx), StdDev(vy)};
  motion_.speed = std::hypot(mx, my);
  motion_.direction = std::atan2(my, mx);

  const double speed_stability =
      1.0 / (1.0 + (motion_.velocity_std[0] + motion_.velocity_std[1]) / 2.0);
  const double direction_consistency = DirectionConsistency();
  motion_.stability_score = (speed_stability + direction_consistency) / 2.0;

  const double data_confidence =
      std::min(static_cast<double>(velocity_history_.size()) / 30.0, 1.0);
  motion_.prediction_confidence = motion_.stability_score * data_confidence;
}

double AircraftKalmanTracker::DirectionConsistency() const {
  // 1 / (1 + 10*std(wrapped heading changes)); needs >= 3 velocity samples.
  if (velocity_history_.size() < 3) return 0.0;
  std::vector<double> diffs;
  diffs.reserve(velocity_history_.size() - 1);
  double prev = 0.0;
  bool first = true;
  for (const auto& v : velocity_history_) {
    const double h = std::atan2(v[1], v[0]);
    if (!first) {
      double d = h - prev;
      if (std::fabs(d) >= M_PI) d -= 2.0 * M_PI * (d > 0 ? 1.0 : (d < 0 ? -1.0 : 0.0));
      diffs.push_back(d);
    }
    prev = h;
    first = false;
  }
  return 1.0 / (1.0 + StdDev(diffs) * 10.0);
}

BBox AircraftKalmanTracker::Predict() {
  // x = F x;  P = F P F^T + Q
  x_ = MatVec8(kF, x_);
  Mat8 FP = MatMul8(kF, P_);
  Mat8 Ft{};
  for (int i = 0; i < N; ++i)
    for (int j = 0; j < N; ++j) Ft[i * N + j] = kF[j * N + i];
  P_ = MatMul8(FP, Ft);
  for (int i = 0; i < N * N; ++i) P_[i] += kQ[i];

  ++age_;
  ++time_since_update_;
  PushMax(trajectory_history_, {x_[0], x_[1]}, 150);
  return StateToBBox(x_.data());
}

std::pair<BBox, double> AircraftKalmanTracker::LongTermFromPattern(
    int frames_ahead) const {
  if (motion_.prediction_confidence > 0.3) {
    Vec8 pred = x_;
    pred[0] += motion_.velocity_avg[0] * frames_ahead;
    pred[1] += motion_.velocity_avg[1] * frames_ahead;
    // size held constant (pred[2:4] = x[2:4] — already copied)
    const double time_decay =
        std::max(0.1, 1.0 - static_cast<double>(frames_ahead) / max_lost_frames_);
    return {StateToBBox(pred.data()), motion_.prediction_confidence * time_decay};
  }
  Vec8 pred = x_;
  for (int i = 0; i < frames_ahead; ++i) pred = MatVec8(kF, pred);
  const double confidence =
      std::max(0.1, 1.0 - static_cast<double>(frames_ahead) / (max_lost_frames_ * 0.5));
  return {StateToBBox(pred.data()), confidence};
}

std::pair<BBox, double> AircraftKalmanTracker::EnhancedLongTermPredict(
    int frames_ahead) {
  if (frames_ahead <= 1) return {Predict(), 1.0};
  AnalyzeMotionPattern();
  return LongTermFromPattern(frames_ahead);
}

void AircraftKalmanTracker::Update(const BBox& bbox) {
  time_since_update_ = 0;
  ++hits_;
  ++hit_streak_;

  if (is_lost_) {
    std::printf("Target %s re-acquired after %d lost frames\n", track_id_.c_str(),
                lost_frames_);
    is_lost_ = false;
    lost_frames_ = 0;
  }

  const auto z = BBoxToCxcywh(bbox);

  // y = z - H x  (H selects the first 4 state entries)
  double y[M];
  for (int i = 0; i < M; ++i) y[i] = z[i] - x_[i];

  // S = H P H^T + R  — the top-left 4x4 of P plus R.
  Mat4 S{};
  for (int i = 0; i < M; ++i)
    for (int j = 0; j < M; ++j) S[i * M + j] = P_[i * N + j];
  for (int i = 0; i < M; ++i) S[i * M + i] += kRMeas;
  const Mat4 Sinv = Inv4(S);

  // K = P H^T S^-1  — (8x4): P's first four columns times S^-1.
  double K[N][M];
  for (int i = 0; i < N; ++i)
    for (int j = 0; j < M; ++j) {
      double s = 0.0;
      for (int k = 0; k < M; ++k) s += P_[i * N + k] * Sinv[k * M + j];
      K[i][j] = s;
    }

  // x += K y
  for (int i = 0; i < N; ++i) {
    double s = 0.0;
    for (int j = 0; j < M; ++j) s += K[i][j] * y[j];
    x_[i] += s;
  }

  // P = (I - K H) P  — K H only touches the first 4 columns.
  Mat8 IKH{};
  for (int i = 0; i < N; ++i) IKH[i * N + i] = 1.0;
  for (int i = 0; i < N; ++i)
    for (int j = 0; j < M; ++j) IKH[i * N + j] -= K[i][j];
  P_ = MatMul8(IKH, P_);

  PushMax(velocity_history_, {x_[4], x_[5]}, 50);
  PushMax(position_history_, {x_[0], x_[1]}, 100);
  PushMax(trajectory_history_, {x_[0], x_[1]}, 150);
  AnalyzeMotionPattern();
}

void AircraftKalmanTracker::MarkAsLost() {
  if (!is_lost_) {
    is_lost_ = true;
    lost_frames_ = 0;
    std::printf(
        "Target %s lost - pos [%.1f, %.1f], vel [%.2f, %.2f], motion confidence "
        "%.2f\n",
        track_id_.c_str(), x_[0], x_[1], x_[4], x_[5],
        motion_.prediction_confidence);
  }
  ++lost_frames_;
  hit_streak_ = 0;
}

std::pair<BBox, double> AircraftKalmanTracker::GetLostPrediction() {
  if (!is_lost_) return {StateToBBox(x_.data()), 1.0};
  return EnhancedLongTermPredict(lost_frames_);
}

TrackInfo AircraftKalmanTracker::GetTrackInfo() const {
  TrackInfo info;
  info.track_id = track_id_;
  const bool is_predicted = time_since_update_ > 0;
  if (is_predicted) {
    if (is_lost_) {
      // GetLostPrediction() may advance the filter when lost_frames <= 1
      // (reference parity); const_cast keeps the public API honest about the
      // pure parts while reproducing the reference's side effect.
      auto [bbox, conf] =
          const_cast<AircraftKalmanTracker*>(this)->GetLostPrediction();
      info.bbox = bbox;
      info.confidence = conf;
    } else {
      info.bbox = StateToBBox(x_.data());
      info.confidence = std::max(0.3, 1.0 - time_since_update_ / 60.0);
    }
    info.status = "predicted";
  } else {
    info.bbox = StateToBBox(x_.data());
    info.confidence = 1.0;
    info.status = "detected";
  }
  info.age = age_;
  info.hits = hits_;
  info.hit_streak = hit_streak_;
  info.time_since_update = time_since_update_;
  info.lost_frames = time_since_update_;  // reference quirk
  info.is_lost = is_predicted;            // reference quirk
  const size_t n = trajectory_history_.size();
  const size_t start = n > 30 ? n - 30 : 0;
  for (size_t i = start; i < n; ++i) info.trajectory.push_back(trajectory_history_[i]);
  info.velocity = {x_[4], x_[5]};
  info.motion_confidence = motion_.prediction_confidence;
  info.is_stable_motion = motion_.stability_score > 0.5;
  info.speed = motion_.speed;
  info.direction = motion_.direction;
  return info;
}

bool AircraftKalmanTracker::ShouldDelete(int max_lost_frames) const {
  if (time_since_update_ > max_lost_frames) return true;
  if (age_ < 5 && hit_streak_ == 0 && time_since_update_ > 15) return true;
  if (age_ < 10 && hit_streak_ <= 1 && time_since_update_ > 30) return true;
  return false;
}

// ---- EnhancedMultiTargetTracker ---------------------------------------------

EnhancedMultiTargetTracker::EnhancedMultiTargetTracker(int max_lost_frames,
                                                       int min_hits,
                                                       double iou_threshold)
    : max_lost_frames_(max_lost_frames),
      min_hits_(min_hits),
      iou_threshold_(iou_threshold) {
  std::printf("Multi-target tracker ready - loss tolerance %d frames (%.1fs @30fps)\n",
              max_lost_frames_, max_lost_frames_ / 30.0);
}

std::vector<EnhancedMultiTargetTracker::Match>
EnhancedMultiTargetTracker::Associate(const std::vector<Detection>& detections,
                                      const std::vector<BBox>& predicted,
                                      std::vector<int>* unmatched_dets,
                                      std::vector<int>* unmatched_trks) const {
  struct Cand {
    int det, trk;
    double iou;
  };
  std::vector<Cand> cands;
  // Candidate order matches np.where's row-major scan; stable sort on
  // descending IoU then reproduces np.argsort order for distinct values.
  for (int d = 0; d < static_cast<int>(detections.size()); ++d)
    for (int t = 0; t < static_cast<int>(predicted.size()); ++t) {
      const double iou = IoUXYXY(detections[d].bbox, predicted[t]);
      if (iou >= iou_threshold_) cands.push_back({d, t, iou});
    }
  std::stable_sort(cands.begin(), cands.end(),
                   [](const Cand& a, const Cand& b) { return a.iou > b.iou; });

  std::vector<Match> matched;
  std::vector<bool> used_det(detections.size(), false);
  std::vector<bool> used_trk(predicted.size(), false);
  for (const auto& c : cands) {
    if (used_det[c.det] || used_trk[c.trk]) continue;
    matched.push_back({c.det, c.trk});
    used_det[c.det] = true;
    used_trk[c.trk] = true;
  }
  for (int d = 0; d < static_cast<int>(detections.size()); ++d)
    if (!used_det[d]) unmatched_dets->push_back(d);
  for (int t = 0; t < static_cast<int>(predicted.size()); ++t)
    if (!used_trk[t]) unmatched_trks->push_back(t);
  return matched;
}

std::vector<TrackInfo> EnhancedMultiTargetTracker::Update(
    const std::vector<Detection>& detections) {
  ++frame_count_;

  // 1) time-update every tracker
  std::vector<BBox> predicted;
  predicted.reserve(trackers_.size());
  for (auto& t : trackers_) predicted.push_back(t->Predict());

  // 2) associate
  std::vector<Match> matched;
  std::vector<int> unmatched_dets, unmatched_trks;
  if (!detections.empty() && !trackers_.empty()) {
    matched = Associate(detections, predicted, &unmatched_dets, &unmatched_trks);
  } else {
    for (int d = 0; d < static_cast<int>(detections.size()); ++d)
      unmatched_dets.push_back(d);
    for (int t = 0; t < static_cast<int>(trackers_.size()); ++t)
      unmatched_trks.push_back(t);
  }

  // 3) measurement-update matched trackers
  for (const auto& m : matched) {
    auto& tracker = *trackers_[m.trk];
    const bool was_lost = tracker.is_lost();
    tracker.Update(detections[m.det].bbox);
    if (was_lost) {
      ++stats_.successful_recoveries;
      std::printf("Tracker %s re-acquired, back to detection mode\n",
                  tracker.track_id().c_str());
    }
  }

  // 4) unmatched trackers go/stay lost
  for (int t : unmatched_trks) {
    auto& tracker = *trackers_[t];
    const bool was_lost = tracker.is_lost();
    tracker.MarkAsLost();
    if (!was_lost)
      std::printf("Tracker %s lost detection, switching to prediction mode\n",
                  tracker.track_id().c_str());
  }

  // 5) new trackers for unmatched detections (ID order = detection index order)
  for (int d : unmatched_dets) {
    char id[16];
    std::snprintf(id, sizeof(id), "T%03d", next_track_id_);
    trackers_.push_back(std::make_unique<AircraftKalmanTracker>(
        detections[d].bbox, id, max_lost_frames_));
    ++next_track_id_;
    ++stats_.total_tracks_created;
    std::printf("New tracker created: %s\n", id);
  }

  // 6) prune dead trackers
  std::vector<std::unique_ptr<AircraftKalmanTracker>> alive;
  alive.reserve(trackers_.size());
  for (auto& t : trackers_) {
    if (t->ShouldDelete(max_lost_frames_)) {
      std::printf("Deleting tracker %s - lost for %d frames\n",
                  t->track_id().c_str(), t->time_since_update());
      ++stats_.total_tracks_terminated;
    } else {
      alive.push_back(std::move(t));
    }
  }
  trackers_ = std::move(alive);
  stats_.current_active_tracks = static_cast<int>(trackers_.size());

  // 7) emit confirmed tracks (lost ones always emit — coasting is the point)
  std::vector<TrackInfo> confirmed;
  for (auto& t : trackers_) {
    if (t->hit_streak() >= min_hits_ || frame_count_ <= min_hits_ || t->is_lost()) {
      TrackInfo info = t->GetTrackInfo();
      if (info.status == "predicted" && info.lost_frames > 30)
        ++stats_.long_term_predictions;
      confirmed.push_back(std::move(info));
    }
  }

  if (frame_count_ % 100 == 0) PrintStatistics();
  return confirmed;
}

void EnhancedMultiTargetTracker::PrintStatistics() const {
  std::printf("\n=== Tracking stats (frame %d) ===\n", frame_count_);
  std::printf("active tracks: %d\n", stats_.current_active_tracks);
  std::printf("tracks created: %d\n", stats_.total_tracks_created);
  std::printf("tracks terminated: %d\n", stats_.total_tracks_terminated);
  std::printf("recoveries: %d\n", stats_.successful_recoveries);
  std::printf("long-term predictions: %d\n", stats_.long_term_predictions);
  for (const auto& t : trackers_) {
    std::printf("  %s: %s, age:%d, hits:%d, lost:%d, conf:%.2f\n",
                t->track_id().c_str(), t->is_lost() ? "lost" : "ok", t->age(),
                t->hits(), t->lost_frames(), t->prediction_confidence());
  }
}

}  // namespace yolo_tpu

// Minimal mirror of the public ALE C++ API surface used by
// stepper.cpp's real-ALE AtariLane (arcade-learning-environment's
// ale_interface.hpp). SYNTAX-CHECK ONLY: tests/test_native.py
// compiles stepper.cpp with -DRLTIME_HAVE_ALE against this header to
// prove the drop-in lane builds; real runs use the ale-py bundled
// header + library (envs/native/bindings._ale_flags).
#pragma once
#include <string>
#include <vector>

namespace ale {

using Action = int;
constexpr Action PLAYER_A_NOOP = 0;
using reward_t = int;

class ALEInterface {
 public:
  void setInt(const std::string&, int) {}
  void setFloat(const std::string&, float) {}
  void loadROM(const std::string&) {}
  std::vector<Action> getMinimalActionSet() { return {0, 1, 3}; }
  void getScreenRGB(std::vector<unsigned char>&) {}
  reward_t act(Action) { return 0; }
  bool game_over() const { return false; }
  int lives() const { return 0; }
  void reset_game() {}
};

}  // namespace ale

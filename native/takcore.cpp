// takcore: native host-side Tak rules engine (C++17, C ABI for ctypes).
//
// Role in the framework (this is NOT the TPU compute path, which is
// pure-JAX): a second, independent implementation of the rules used as
// (a) a differential-testing oracle for the vectorized JAX engine,
// (b) a fast recursive perft for deep validation, and
// (c) a zero-latency host engine for interactive protocol servers.
//
// Semantics mirror the reference rules crate (tak/src/game.rs,
// move_gen.rs, tile.rs, board.rs) and the flat channel-scheme action ids
// of tak_tpu.actions: action = channel*n^2 + row*n + col with channels
// [place F/S/C | dir(+ > - <) x pattern-mask].  Move enumeration follows
// the reference possible_moves order (column-major squares; flat, wall,
// cap placements; spreads by direction Up,Down,Left,Right, pickup
// ascending, composition bits ascending).
//
// Build: make -C native   (produces libtakcore.so)

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <vector>

namespace {

constexpr int EMPTY = 0, FLAT = 1, WALL = 2, CAP = 3;
constexpr int WHITE = 0, BLACK = 1;
// result codes match tak_tpu.types
constexpr int ONGOING = 0, WHITE_ROAD = 1, BLACK_ROAD = 2, WHITE_FLATS = 3,
              BLACK_FLATS = 4, DRAW_FLATS = 5, DRAW_REVERSIBLE = 6;
constexpr int REVERSIBLE_PLIES = 50;

struct Stack128 {  // color bits, bottom at bit 0 (1 = black)
  uint64_t lo = 0, hi = 0;
  bool bit(int h) const { return h < 64 ? (lo >> h) & 1 : (hi >> (h - 64)) & 1; }
  void set(int h, bool v) {
    if (h < 64) lo = (lo & ~(1ull << h)) | (uint64_t(v) << h);
    else hi = (hi & ~(1ull << (h - 64))) | (uint64_t(v) << (h - 64));
  }
};

void starting_stones(int n, int* stones, int* caps) {
  switch (n) {
    case 3: *stones = 10; *caps = 0; break;
    case 4: *stones = 15; *caps = 0; break;
    case 5: *stones = 21; *caps = 1; break;
    case 6: *stones = 30; *caps = 1; break;
    case 7: *stones = 40; *caps = 2; break;
    default: *stones = 50; *caps = 2; break;
  }
}

struct Game {
  int n = 6;
  int half_komi = 0;
  int to_move = WHITE;
  int ply = 0;
  int reversible = 0;
  int stones[2] = {0, 0};
  int caps[2] = {0, 0};
  int heights[64] = {0};
  int tops[64] = {0};
  Stack128 stacks[64];

  int sq(int r, int c) const { return r * n + c; }
  bool opening() const { return ply < 2; }
  int effective_color() const { return opening() ? 1 - to_move : to_move; }
  int top_color(int s) const { return stacks[s].bit(heights[s] - 1) ? BLACK : WHITE; }

  void reset(int size, int hk) {
    *this = Game();
    n = size;
    half_komi = hk;
    starting_stones(n, &stones[0], &caps[0]);
    stones[1] = stones[0];
    caps[1] = caps[0];
  }
};

constexpr int DR[4] = {1, 0, -1, 0};  // + > - <  (Up, Right, Down, Left)
constexpr int DC[4] = {0, 1, 0, -1};

int num_patterns(int n) { return (1 << n) - 2; }
int move_channels(int n) { return 3 + 4 * num_patterns(n); }
int action_space(int n) { return n * n * move_channels(n); }

// decode pattern mask (channel p => mask p+1) into drop counts
int pattern_drops(int mask, int n, int* drops) {
  int tz = __builtin_ctz(mask);
  int k = n - tz;
  int kbits = mask >> tz;
  int cnt = 0, prev = -1;
  for (int i = 0; i < k; ++i) {
    if ((kbits >> (k - 1 - i)) & 1) {
      drops[cnt++] = i - prev;
      prev = i;
    }
  }
  return cnt;
}

int play_action(Game& g, int a) {  // returns 1 on (assumed) success
  const int n = g.n;
  int ch = a / (n * n), s = a % (n * n);
  if (ch < 3) {  // placement
    int piece = ch + 1;
    int color = g.effective_color();
    g.stacks[s] = Stack128();
    g.stacks[s].set(0, color == BLACK);
    g.heights[s] = 1;
    g.tops[s] = piece;
    if (piece == CAP) g.caps[g.to_move]--;
    else g.stones[color]--;
    g.reversible = 0;
  } else {
    int P = num_patterns(n);
    int d = (ch - 3) / P, p = (ch - 3) % P;
    int drops[8];
    int scnt = pattern_drops(p + 1, n, drops);
    int k = 0;
    for (int i = 0; i < scnt; ++i) k += drops[i];
    int h = g.heights[s];
    // pop carry (top-to-bottom order preserved as bottom-first array)
    bool carry[8];
    for (int i = 0; i < k; ++i) carry[i] = g.stacks[s].bit(h - k + i);
    for (int i = 0; i < k; ++i) g.stacks[s].set(h - k + i, false);
    int orig_top = g.tops[s];
    g.heights[s] = h - k;
    g.tops[s] = (h - k) > 0 ? FLAT : EMPTY;
    int r = s / n, c = s % n, ci = 0;
    for (int j = 0; j < scnt; ++j) {
      r += DR[d]; c += DC[d];
      int t = g.sq(r, c);
      for (int m = 0; m < drops[j]; ++m) {
        g.stacks[t].set(g.heights[t], carry[ci++]);
        g.heights[t]++;
      }
      g.tops[t] = (j == scnt - 1) ? orig_top : FLAT;
    }
    g.reversible++;
  }
  g.ply++;
  g.to_move = 1 - g.to_move;
  return 1;
}

bool has_road(const Game& g, int color) {
  const int n = g.n;
  bool own[64];
  for (int s = 0; s < n * n; ++s)
    own[s] = g.heights[s] > 0 && (g.tops[s] == FLAT || g.tops[s] == CAP) &&
             g.top_color(s) == color;
  for (int axis = 0; axis < 2; ++axis) {
    bool seen[64] = {false};
    int stack_[64], top = 0;
    for (int i = 0; i < n; ++i) {
      int s = axis == 0 ? g.sq(0, i) : g.sq(i, 0);
      if (own[s] && !seen[s]) { seen[s] = true; stack_[top++] = s; }
    }
    while (top) {
      int s = stack_[--top];
      int r = s / n, c = s % n;
      const int nr[4] = {r + 1, r - 1, r, r};
      const int nc[4] = {c, c, c + 1, c - 1};
      for (int i = 0; i < 4; ++i) {
        if (nr[i] < 0 || nr[i] >= n || nc[i] < 0 || nc[i] >= n) continue;
        int t = g.sq(nr[i], nc[i]);
        if (own[t] && !seen[t]) { seen[t] = true; stack_[top++] = t; }
      }
    }
    for (int i = 0; i < n; ++i) {
      int s = axis == 0 ? g.sq(n - 1, i) : g.sq(i, n - 1);
      if (seen[s]) return true;
    }
  }
  return false;
}

int result_of(const Game& g) {
  int just_moved = 1 - g.to_move;
  if (has_road(g, just_moved)) return just_moved == WHITE ? WHITE_ROAD : BLACK_ROAD;
  if (has_road(g, g.to_move)) return g.to_move == WHITE ? WHITE_ROAD : BLACK_ROAD;
  bool out = (g.stones[0] == 0 && g.caps[0] == 0) ||
             (g.stones[1] == 0 && g.caps[1] == 0);
  bool full = true;
  for (int s = 0; s < g.n * g.n; ++s)
    if (g.heights[s] == 0) { full = false; break; }
  if (out || full) {
    int diff = 0;
    for (int s = 0; s < g.n * g.n; ++s)
      if (g.heights[s] > 0 && g.tops[s] == FLAT)
        diff += g.top_color(s) == WHITE ? 1 : -1;
    diff -= g.half_komi / 2;  // trunc toward zero like Rust i8 division
    if (diff > 0) return WHITE_FLATS;
    if (diff < 0) return BLACK_FLATS;
    return (g.half_komi % 2) ? BLACK_FLATS : DRAW_FLATS;
  }
  if (g.reversible >= REVERSIBLE_PLIES) return DRAW_REVERSIBLE;
  return ONGOING;
}

// canonical move enumeration (move_gen.rs order); returns count
int legal_actions(const Game& g, int* out, int cap) {
  const int n = g.n, n2 = n * n, P = num_patterns(n);
  int cnt = 0;
  auto push = [&](int a) { if (cnt < cap) out[cnt] = a; cnt++; };
  if (g.opening()) {
    for (int c = 0; c < n; ++c)
      for (int r = 0; r < n; ++r)
        if (g.heights[g.sq(r, c)] == 0) push(0 * n2 + g.sq(r, c));
    return cnt;
  }
  int color = g.to_move;
  bool have_stones = g.stones[color] > 0, have_caps = g.caps[color] > 0;
  // pattern ranks: pickup ascending then kbits ascending
  static thread_local std::vector<int> order_cache;
  static thread_local int order_n = -1;
  if (order_n != n) {
    order_cache.clear();
    for (int k = 1; k <= n; ++k) {
      for (int mask = 1; mask < (1 << n) - 1; ++mask) {
        int tz = __builtin_ctz(mask);
        if (n - tz == k) order_cache.push_back(mask);
      }
    }
    order_n = n;
  }
  for (int c = 0; c < n; ++c) {
    for (int r = 0; r < n; ++r) {
      int s = g.sq(r, c);
      if (g.heights[s] == 0) {
        if (have_stones) { push(0 * n2 + s); push(1 * n2 + s); }
        if (have_caps) push(2 * n2 + s);
        continue;
      }
      if (g.top_color(s) != color) continue;
      int maxk = g.heights[s] < n ? g.heights[s] : n;
      bool cap_top = g.tops[s] == CAP;
      for (int dd = 0; dd < 4; ++dd) {       // enumeration order: + - < >
        static const int DIRMAP[4] = {0, 2, 3, 1};  // Up, Down, Left, Right
        int d = DIRMAP[dd];
        for (int mask : order_cache) {
          int drops[8];
          int scnt = pattern_drops(mask, n, drops);
          int k = 0;
          for (int i = 0; i < scnt; ++i) k += drops[i];
          if (k > maxk) continue;
          // path check
          int rr = r, cc = c;
          bool ok = true;
          for (int j = 0; j < scnt && ok; ++j) {
            rr += DR[d]; cc += DC[d];
            if (rr < 0 || rr >= n || cc < 0 || cc >= n) { ok = false; break; }
            int t = g.sq(rr, cc);
            if (g.tops[t] == CAP) ok = false;
            else if (g.tops[t] == WALL)
              ok = (j == scnt - 1) && cap_top && drops[j] == 1;
          }
          if (ok) push((3 + d * P + (mask - 1)) * n2 + s);
        }
      }
    }
  }
  return cnt;
}

long long perft(const Game& g, int depth) {
  if (depth == 0 || result_of(g) != ONGOING) return 1;
  int acts[4096];
  int cnt = legal_actions(g, acts, 4096);
  if (depth == 1) return cnt;
  long long total = 0;
  for (int i = 0; i < cnt; ++i) {
    Game copy = g;
    play_action(copy, acts[i]);
    total += perft(copy, depth - 1);
  }
  return total;
}

}  // namespace

extern "C" {

Game* tak_new(int n, int half_komi) {
  Game* g = new Game();
  g->reset(n, half_komi);
  return g;
}
void tak_free(Game* g) { delete g; }
Game* tak_clone(const Game* g) { return new Game(*g); }
void tak_reset(Game* g, int n, int half_komi) { g->reset(n, half_komi); }

int tak_play(Game* g, int action) { return play_action(*g, action); }
int tak_result(const Game* g) { return result_of(*g); }
int tak_legal(const Game* g, int* out, int cap) { return legal_actions(*g, out, cap); }
long long tak_perft(const Game* g, int depth) { return perft(*g, depth); }

int tak_ply(const Game* g) { return g->ply; }
int tak_to_move(const Game* g) { return g->to_move; }
int tak_stones(const Game* g, int color) { return g->stones[color]; }
int tak_caps(const Game* g, int color) { return g->caps[color]; }
int tak_height(const Game* g, int s) { return g->heights[s]; }
int tak_top(const Game* g, int s) { return g->tops[s]; }
int tak_stack_color(const Game* g, int s, int h) { return g->stacks[s].bit(h); }
int tak_reversible(const Game* g) { return g->reversible; }

void tak_set_reserves(Game* g, int ws, int wc, int bs, int bc) {
  g->stones[0] = ws; g->caps[0] = wc; g->stones[1] = bs; g->caps[1] = bc;
}

}  // extern "C"

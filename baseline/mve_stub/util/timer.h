/* Minimal MVE-compatible util::WallTimer. */

#ifndef UTIL_TIMER_STUB_HEADER
#define UTIL_TIMER_STUB_HEADER

#include <chrono>
#include <cstddef>

namespace util {

class WallTimer
{
public:
    WallTimer (void) { reset(); }

    void reset (void)
    {
        start = std::chrono::steady_clock::now();
    }

    std::size_t get_elapsed (void) const  /* milliseconds */
    {
        return std::size_t(std::chrono::duration_cast<
            std::chrono::milliseconds>(
                std::chrono::steady_clock::now() - start).count());
    }

    float get_elapsed_sec (void) const
    {
        return float(get_elapsed()) / 1000.0f;
    }

private:
    std::chrono::steady_clock::time_point start;
};

}  // namespace util

#endif /* UTIL_TIMER_STUB_HEADER */

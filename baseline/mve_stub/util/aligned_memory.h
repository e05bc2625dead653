/* Minimal MVE-compatible util::AlignedMemory (16-byte aligned buffer). */

#ifndef UTIL_ALIGNED_MEMORY_STUB_HEADER
#define UTIL_ALIGNED_MEMORY_STUB_HEADER

#include <cstddef>
#include <cstdlib>
#include <algorithm>
#include <new>

namespace util {

template <typename T, std::size_t ALIGNMENT = 16>
class AlignedMemory
{
public:
    AlignedMemory (void) = default;

    explicit AlignedMemory (std::size_t size) { resize(size); }

    AlignedMemory (std::size_t size, T const& value)
    {
        resize(size, value);
    }

    AlignedMemory (AlignedMemory const& other)
    {
        resize(other.n);
        std::copy(other.ptr, other.ptr + other.n, ptr);
    }

    AlignedMemory& operator= (AlignedMemory const& other)
    {
        if (this != &other)
        {
            resize(other.n);
            std::copy(other.ptr, other.ptr + other.n, ptr);
        }
        return *this;
    }

    ~AlignedMemory (void) { release(); }

    void resize (std::size_t size)
    {
        if (size == n)
            return;
        release();
        if (size == 0)
            return;
        std::size_t bytes = size * sizeof(T);
        bytes = (bytes + ALIGNMENT - 1) / ALIGNMENT * ALIGNMENT;
        void* mem = nullptr;
        if (posix_memalign(&mem, ALIGNMENT, bytes) != 0)
            throw std::bad_alloc();
        ptr = static_cast<T*>(mem);
        n = size;
    }

    void resize (std::size_t size, T const& value)
    {
        resize(size);
        std::fill(ptr, ptr + n, value);
    }

    std::size_t size (void) const { return n; }

    T* data (void) { return ptr; }
    T const* data (void) const { return ptr; }
    T* begin (void) { return ptr; }
    T const* begin (void) const { return ptr; }
    T* end (void) { return ptr + n; }
    T const* end (void) const { return ptr + n; }

    T const& operator[] (std::size_t i) const { return ptr[i]; }
    T& operator[] (std::size_t i) { return ptr[i]; }
    T const& at (std::size_t i) const { return ptr[i]; }
    T& at (std::size_t i) { return ptr[i]; }

private:
    void release (void)
    {
        if (ptr != nullptr)
            std::free(ptr);
        ptr = nullptr;
        n = 0;
    }

    T* ptr = nullptr;
    std::size_t n = 0;
};

}  // namespace util

#endif /* UTIL_ALIGNED_MEMORY_STUB_HEADER */

// Host-side data plane for dvbs2_tpu — the native runtime around the TPU
// compute path.
//
// Equivalent of the reference's threaded radio FIFO machinery
// (src/common/Module/Radio/Radio_USRP/Radio_USRP.cpp:19-47,141-180: dedicated
// send/receive threads + pre-allocated FIFOs) and of Radio_user_binary's
// blocking file IO (Radio_user_binary.cpp:56-115) — rebuilt as a lock-based
// ring buffer with a producer thread so sample blocks stream into the Python/
// JAX process without stalling the device feed, plus fast bit pack/unpack for
// sink output (Sink_user_binary equivalent).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct RingStream {
    FILE* fh = nullptr;
    std::vector<float> buf;         // ring of floats (interleaved I/Q)
    size_t cap = 0;
    size_t head = 0;                // write position
    size_t tail = 0;                // read position
    size_t fill = 0;                // floats currently buffered
    bool loop = true;
    bool eof = false;               // file exhausted (no-loop) and drained
    bool stop = false;
    std::thread producer;
    std::mutex mu;
    std::condition_variable cv_can_write, cv_can_read;

    void run() {
        std::vector<float> chunk(1 << 16);
        for (;;) {
            size_t nread = fread(chunk.data(), sizeof(float), chunk.size(), fh);
            if (nread == 0) {
                if (!loop) {
                    std::lock_guard<std::mutex> g(mu);
                    eof = true;
                    cv_can_read.notify_all();
                    return;
                }
                rewind(fh);
                continue;
            }
            size_t off = 0;
            while (off < nread) {
                std::unique_lock<std::mutex> lk(mu);
                cv_can_write.wait(lk, [&] { return stop || fill < cap; });
                if (stop) return;
                size_t n = std::min(nread - off, cap - fill);
                for (size_t i = 0; i < n; i++) {
                    buf[head] = chunk[off + i];
                    head = (head + 1) % cap;
                }
                fill += n;
                off += n;
                cv_can_read.notify_all();
            }
        }
    }
};

}  // namespace

extern "C" {

// ---- threaded ring-buffer file stream (receive path) ----------------------

void* dvbs2_stream_open(const char* path, size_t capacity_floats, int loop) {
    auto* s = new RingStream();
    s->fh = fopen(path, "rb");
    if (!s->fh) { delete s; return nullptr; }
    s->cap = capacity_floats;
    s->buf.resize(capacity_floats);
    s->loop = loop != 0;
    s->producer = std::thread([s] { s->run(); });
    return s;
}

// Blocking read of n floats; returns number delivered (< n only at EOF).
size_t dvbs2_stream_read(void* handle, float* out, size_t n) {
    auto* s = static_cast<RingStream*>(handle);
    size_t got = 0;
    while (got < n) {
        std::unique_lock<std::mutex> lk(s->mu);
        s->cv_can_read.wait(lk, [&] { return s->fill > 0 || s->eof; });
        if (s->fill == 0 && s->eof) break;
        size_t take = std::min(n - got, s->fill);
        for (size_t i = 0; i < take; i++) {
            out[got + i] = s->buf[s->tail];
            s->tail = (s->tail + 1) % s->cap;
        }
        s->fill -= take;
        got += take;
        s->cv_can_write.notify_all();
    }
    return got;
}

void dvbs2_stream_close(void* handle) {
    auto* s = static_cast<RingStream*>(handle);
    {
        std::lock_guard<std::mutex> g(s->mu);
        s->stop = true;
    }
    s->cv_can_write.notify_all();
    if (s->producer.joinable()) s->producer.join();
    fclose(s->fh);
    delete s;
}

// ---- bit pack / unpack (sink/source fast path) ----------------------------

void dvbs2_pack_bits(const int8_t* bits, size_t n, uint8_t* out) {
    size_t nb = n / 8;
    for (size_t i = 0; i < nb; i++) {
        uint8_t b = 0;
        for (int j = 0; j < 8; j++) b = (uint8_t)((b << 1) | (bits[8 * i + j] & 1));
        out[i] = b;
    }
}

void dvbs2_unpack_bits(const uint8_t* bytes, size_t n_bits, int8_t* out) {
    for (size_t i = 0; i < n_bits; i++)
        out[i] = (bytes[i / 8] >> (7 - (i % 8))) & 1;
}

}  // extern "C"

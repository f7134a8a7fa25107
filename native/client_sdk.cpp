// deeppowers-tpu native C++ client SDK.
//
// The reference exposed an in-process C++ api::Model (reference:
// src/api/cpp/include/deeppowers.hpp:41-87) plus a gRPC client SDK with
// retry/backoff, async futures and client metrics
// (src/core/api/client_sdk.hpp:28-58). Here the engine itself is a JAX
// program, so the native C++ surface is a *client* over the wire protocol:
// - blocking generate() against the HTTP server (serving/server.py
//   /api/v1/generate) with the reference's retry policy (3 attempts,
//   100ms initial backoff, x2 factor, 5s cap),
// - generate_async() returning std::future (client_sdk.hpp:38-41),
// - generate_stream() consuming the server's SSE chunked stream
//   (/api/v1/generate_stream) with per-delta callbacks; returning false
//   from the callback cancels by closing the socket,
// - ClientMetrics (requests/failures/latency, client_sdk.hpp:53-58).
//
// Self-contained: POSIX sockets, no third-party deps. Also builds a small
// CLI (`dpclient`) used by tests/test_native_client.py.
//
// Build: see native/Makefile (targets libdpclient.so, dpclient).

#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <chrono>
#include <cstring>
#include <functional>
#include <future>
#include <sstream>
#include <string>
#include <thread>

namespace dp {

struct GenerationConfig {
    int max_tokens = 100;        // reference defaults: deeppowers.hpp:17-26
    double temperature = 0.7;
    double top_p = 0.9;
    int top_k = 50;
    bool do_sample = true;
};

struct RetryPolicy {
    int max_attempts = 3;        // reference: client_sdk.hpp:28-33
    int initial_backoff_ms = 100;
    int max_backoff_ms = 5000;
    double multiplier = 2.0;
};

namespace detail {

std::string json_escape(const std::string& s) {
    std::string out;
    out.reserve(s.size() + 8);
    for (char c : s) {
        switch (c) {
            case '"': out += "\\\""; break;
            case '\\': out += "\\\\"; break;
            case '\n': out += "\\n"; break;
            case '\r': out += "\\r"; break;
            case '\t': out += "\\t"; break;
            default:
                if (static_cast<unsigned char>(c) < 0x20) {
                    char buf[8];
                    snprintf(buf, sizeof(buf), "\\u%04x", c);
                    out += buf;
                } else {
                    out += c;
                }
        }
    }
    return out;
}

// Connect + send one HTTP/1.1 POST; returns the socket fd (or -1).
int open_post(const std::string& host, int port, const std::string& path,
              const std::string& payload, int timeout_s) {
    struct addrinfo hints = {};
    hints.ai_family = AF_UNSPEC;
    hints.ai_socktype = SOCK_STREAM;
    struct addrinfo* res = nullptr;
    const std::string port_s = std::to_string(port);
    if (getaddrinfo(host.c_str(), port_s.c_str(), &hints, &res) != 0)
        return -1;
    int fd = -1;
    for (auto* p = res; p; p = p->ai_next) {
        fd = socket(p->ai_family, p->ai_socktype, p->ai_protocol);
        if (fd < 0) continue;
        if (connect(fd, p->ai_addr, p->ai_addrlen) == 0) break;
        close(fd);
        fd = -1;
    }
    freeaddrinfo(res);
    if (fd < 0) return -1;

    struct timeval tv = {timeout_s, 0};
    setsockopt(fd, SOL_SOCKET, SO_RCVTIMEO, &tv, sizeof(tv));

    std::ostringstream req;
    req << "POST " << path << " HTTP/1.1\r\n"
        << "Host: " << host << "\r\n"
        << "Content-Type: application/json\r\n"
        << "Content-Length: " << payload.size() << "\r\n"
        << "Connection: close\r\n\r\n"
        << payload;
    const std::string data = req.str();
    size_t sent = 0;
    while (sent < data.size()) {
        ssize_t n = send(fd, data.data() + sent, data.size() - sent, 0);
        if (n <= 0) { close(fd); return -1; }
        sent += n;
    }
    return fd;
}

// One HTTP/1.1 POST round trip. Returns status code, fills body.
int http_post(const std::string& host, int port, const std::string& path,
              const std::string& payload, std::string* body,
              int timeout_s = 600) {
    int fd = open_post(host, port, path, payload, timeout_s);
    if (fd < 0) return -1;
    std::string resp;
    char buf[4096];
    ssize_t n;
    while ((n = recv(fd, buf, sizeof(buf), 0)) > 0) resp.append(buf, n);
    close(fd);

    if (resp.rfind("HTTP/", 0) != 0) return -1;
    int code = atoi(resp.c_str() + resp.find(' ') + 1);
    auto hdr_end = resp.find("\r\n\r\n");
    if (hdr_end != std::string::npos && body)
        *body = resp.substr(hdr_end + 4);
    return code;
}

// Streaming POST: reads the chunked SSE response and invokes on_event for
// every "data: ..." payload. on_event returning false cancels (socket
// close aborts the request server-side). Returns the HTTP status, or -1.
int http_post_sse(const std::string& host, int port, const std::string& path,
                  const std::string& payload,
                  const std::function<bool(const std::string&)>& on_event,
                  int timeout_s = 600) {
    int fd = open_post(host, port, path, payload, timeout_s);
    if (fd < 0) return -1;

    std::string raw;           // bytes received so far
    char buf[4096];
    ssize_t n;
    int code = -1;
    size_t body_start = std::string::npos;
    std::string body;          // de-chunked bytes
    size_t chunk_pos = 0;      // parse cursor into raw's body section
    std::string events;        // SSE accumulator
    bool chunked = false;

    auto drain_events = [&]() -> bool {
        size_t sep;
        while ((sep = events.find("\n\n")) != std::string::npos) {
            std::string ev = events.substr(0, sep);
            events.erase(0, sep + 2);
            if (ev.rfind("data: ", 0) == 0) {
                if (!on_event(ev.substr(6))) return false;
            }
        }
        return true;
    };

    while ((n = recv(fd, buf, sizeof(buf), 0)) > 0) {
        raw.append(buf, n);
        if (body_start == std::string::npos) {
            auto hdr_end = raw.find("\r\n\r\n");
            if (hdr_end == std::string::npos) continue;
            if (raw.rfind("HTTP/", 0) != 0) { close(fd); return -1; }
            code = atoi(raw.c_str() + raw.find(' ') + 1);
            std::string headers = raw.substr(0, hdr_end);
            for (auto& c : headers) c = tolower(c);
            chunked = headers.find("transfer-encoding: chunked")
                      != std::string::npos;
            body_start = hdr_end + 4;
            chunk_pos = body_start;
            if (code != 200) {      // error body, not a stream
                close(fd);
                return code;
            }
        }
        if (!chunked) {
            events.append(raw, chunk_pos, raw.size() - chunk_pos);
            chunk_pos = raw.size();
        } else {
            // de-chunk as much as available
            for (;;) {
                auto le = raw.find("\r\n", chunk_pos);
                if (le == std::string::npos) break;
                size_t sz = strtoul(raw.c_str() + chunk_pos, nullptr, 16);
                if (sz == 0) { close(fd); drain_events(); return code; }
                if (raw.size() < le + 2 + sz + 2) break;   // partial chunk
                events.append(raw, le + 2, sz);
                chunk_pos = le + 2 + sz + 2;
            }
        }
        if (!drain_events()) { close(fd); return code; }   // cancelled
    }
    close(fd);
    drain_events();
    return code;
}

// Extract a top-level string field from a JSON object (server responses
// are flat enough for a scan; a full parser is overkill for the SDK).
std::string json_string_field(const std::string& json,
                              const std::string& key) {
    const std::string pat = "\"" + key + "\"";
    auto pos = json.find(pat);
    if (pos == std::string::npos) return "";
    pos = json.find('"', json.find(':', pos));
    if (pos == std::string::npos) return "";
    std::string out;
    for (size_t i = pos + 1; i < json.size(); ++i) {
        char c = json[i];
        if (c == '\\' && i + 1 < json.size()) {
            char e = json[++i];
            switch (e) {
                case 'n': out += '\n'; break;
                case 't': out += '\t'; break;
                case 'r': out += '\r'; break;
                case '"': out += '"'; break;
                case '\\': out += '\\'; break;
                case 'u': {
                    if (i + 4 < json.size()) {
                        int cp = std::stoi(json.substr(i + 1, 4), nullptr, 16);
                        if (cp < 0x80) out += static_cast<char>(cp);
                        else if (cp < 0x800) {
                            out += static_cast<char>(0xC0 | (cp >> 6));
                            out += static_cast<char>(0x80 | (cp & 0x3F));
                        } else {
                            out += static_cast<char>(0xE0 | (cp >> 12));
                            out += static_cast<char>(0x80 | ((cp >> 6) & 0x3F));
                            out += static_cast<char>(0x80 | (cp & 0x3F));
                        }
                        i += 4;
                    }
                    break;
                }
                default: out += e;
            }
        } else if (c == '"') {
            break;
        } else {
            out += c;
        }
    }
    return out;
}

}  // namespace detail

// Outcome of one generation (async surface needs a value type).
struct GenerationResult {
    bool ok = false;
    std::string text;
    std::string error;
};

// Client-side counters (reference: client_sdk.hpp:53-58).
struct ClientMetrics {
    std::atomic<uint64_t> requests{0};
    std::atomic<uint64_t> failures{0};
    std::atomic<uint64_t> total_latency_ms{0};
    double avg_latency_ms() const {
        uint64_t r = requests.load();
        return r ? static_cast<double>(total_latency_ms.load()) / r : 0.0;
    }
};

class Client {
  public:
    Client(std::string host, int port, RetryPolicy retry = {})
        : host_(std::move(host)), port_(port), retry_(retry) {}

    // Blocking generation; returns true on success and fills *text.
    // Retries transient failures with exponential backoff.
    bool generate(const std::string& prompt, const GenerationConfig& cfg,
                  std::string* text, std::string* error = nullptr) {
        const auto t0 = std::chrono::steady_clock::now();
        metrics_.requests.fetch_add(1);
        int backoff = retry_.initial_backoff_ms;
        for (int attempt = 0; attempt < retry_.max_attempts; ++attempt) {
            std::string resp;
            int code = detail::http_post(host_, port_, "/api/v1/generate",
                                         request_json(prompt, cfg), &resp);
            if (code == 200) {
                if (text) *text = detail::json_string_field(resp, "text");
                record_latency(t0);
                return true;
            }
            if (code == 400 || code == 401) {  // not retryable
                if (error) *error = resp;
                metrics_.failures.fetch_add(1);
                record_latency(t0);
                return false;
            }
            if (error) *error = resp.empty() ? "connection failed" : resp;
            std::this_thread::sleep_for(std::chrono::milliseconds(backoff));
            backoff = std::min<int>(backoff * retry_.multiplier,
                                    retry_.max_backoff_ms);
        }
        metrics_.failures.fetch_add(1);
        record_latency(t0);
        return false;
    }

    // Async generation (reference: client_sdk.hpp:38-41 generate_async).
    std::future<GenerationResult> generate_async(
            const std::string& prompt, const GenerationConfig& cfg) {
        return std::async(std::launch::async, [this, prompt, cfg]() {
            GenerationResult r;
            r.ok = generate(prompt, cfg, &r.text, &r.error);
            return r;
        });
    }

    // Streaming generation over the server's SSE endpoint. on_delta is
    // invoked with each text fragment; return false to cancel. Returns
    // true when the stream completed normally.
    bool generate_stream(const std::string& prompt,
                         const GenerationConfig& cfg,
                         const std::function<bool(const std::string&)>&
                             on_delta,
                         std::string* error = nullptr) {
        const auto t0 = std::chrono::steady_clock::now();
        metrics_.requests.fetch_add(1);
        bool done = false;
        int code = detail::http_post_sse(
            host_, port_, "/api/v1/generate_stream",
            request_json(prompt, cfg),
            [&](const std::string& ev) {
                if (ev.find("\"done\"") != std::string::npos &&
                    ev.find("true") != std::string::npos) {
                    done = true;
                    return true;
                }
                const std::string delta =
                    detail::json_string_field(ev, "text");
                return delta.empty() ? true : on_delta(delta);
            });
        record_latency(t0);
        if (code != 200) {
            if (error) *error = "stream failed (http " +
                                std::to_string(code) + ")";
            metrics_.failures.fetch_add(1);
            return false;
        }
        return true;   // completed or client-cancelled
    }

    const ClientMetrics& metrics() const { return metrics_; }

  private:
    static std::string request_json(const std::string& prompt,
                                    const GenerationConfig& cfg) {
        std::ostringstream body;
        body << "{\"prompt\":\"" << detail::json_escape(prompt) << "\","
             << "\"max_tokens\":" << cfg.max_tokens << ","
             << "\"temperature\":" << cfg.temperature << ","
             << "\"top_p\":" << cfg.top_p << ","
             << "\"top_k\":" << cfg.top_k << ","
             << "\"do_sample\":" << (cfg.do_sample ? "true" : "false") << "}";
        return body.str();
    }

    void record_latency(std::chrono::steady_clock::time_point t0) {
        metrics_.total_latency_ms.fetch_add(
            std::chrono::duration_cast<std::chrono::milliseconds>(
                std::chrono::steady_clock::now() - t0).count());
    }

    std::string host_;
    int port_;
    RetryPolicy retry_;
    ClientMetrics metrics_;
};

}  // namespace dp

#ifdef DPCLIENT_MAIN
#include <cstdio>

int main(int argc, char** argv) {
    // optional mode flag first: --stream | --async
    std::string mode;
    int base = 1;
    if (argc > 1 && argv[1][0] == '-') { mode = argv[1]; base = 2; }
    if (argc < base + 3) {
        fprintf(stderr,
                "usage: dpclient [--stream|--async] HOST PORT PROMPT "
                "[MAX_TOKENS] [TEMP]\n");
        return 2;
    }
    dp::GenerationConfig cfg;
    if (argc > base + 3) cfg.max_tokens = atoi(argv[base + 3]);
    if (argc > base + 4) { cfg.temperature = atof(argv[base + 4]);
                           cfg.do_sample = cfg.temperature > 0; }
    dp::Client client(argv[base], atoi(argv[base + 1]));
    const std::string prompt = argv[base + 2];

    if (mode == "--stream") {
        int deltas = 0;
        std::string err;
        bool ok = client.generate_stream(
            prompt, cfg,
            [&](const std::string& d) {
                ++deltas;
                fwrite(d.data(), 1, d.size(), stdout);
                fflush(stdout);
                return true;
            }, &err);
        fprintf(stderr, "\n[stream %s: %d deltas, avg %.0f ms]\n",
                ok ? "ok" : err.c_str(), deltas,
                client.metrics().avg_latency_ms());
        return ok ? 0 : 1;
    }
    if (mode == "--async") {
        auto f1 = client.generate_async(prompt, cfg);
        auto f2 = client.generate_async(prompt, cfg);
        auto r1 = f1.get();
        auto r2 = f2.get();
        if (!r1.ok || !r2.ok) {
            fprintf(stderr, "error: %s %s\n", r1.error.c_str(),
                    r2.error.c_str());
            return 1;
        }
        printf("%s\n%s\n", r1.text.c_str(), r2.text.c_str());
        fprintf(stderr, "[async ok: requests=%llu avg %.0f ms]\n",
                (unsigned long long)client.metrics().requests.load(),
                client.metrics().avg_latency_ms());
        return 0;
    }
    std::string text, error;
    if (!client.generate(prompt, cfg, &text, &error)) {
        fprintf(stderr, "error: %s\n", error.c_str());
        return 1;
    }
    printf("%s\n", text.c_str());
    return 0;
}
#endif

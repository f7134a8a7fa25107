// deeppowers-tpu native C++ client SDK.
//
// The reference exposed an in-process C++ api::Model (reference:
// src/api/cpp/include/deeppowers.hpp:41-87) plus a gRPC client SDK with
// retry/backoff (src/core/api/client_sdk.hpp:28-33). Here the engine itself
// is a JAX program, so the native C++ surface is a *client* over the wire
// protocol: blocking generate() against the HTTP server
// (serving/server.py /api/v1/generate) with the reference's retry policy
// (3 attempts, 100ms initial backoff, x2 factor, 5s cap).
//
// Self-contained: POSIX sockets, no third-party deps. Also builds a small
// CLI (`dpclient`) used by tests/test_native_client.py.
//
// Build: see native/Makefile (targets libdpclient.so, dpclient).

#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

#include <chrono>
#include <cstring>
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

// One HTTP/1.1 POST round trip. Returns status code, fills body.
int http_post(const std::string& host, int port, const std::string& path,
              const std::string& payload, std::string* body,
              int timeout_s = 600) {
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

class Client {
  public:
    Client(std::string host, int port, RetryPolicy retry = {})
        : host_(std::move(host)), port_(port), retry_(retry) {}

    // Blocking generation; returns true on success and fills *text.
    // Retries transient failures with exponential backoff.
    bool generate(const std::string& prompt, const GenerationConfig& cfg,
                  std::string* text, std::string* error = nullptr) {
        std::ostringstream body;
        body << "{\"prompt\":\"" << detail::json_escape(prompt) << "\","
             << "\"max_tokens\":" << cfg.max_tokens << ","
             << "\"temperature\":" << cfg.temperature << ","
             << "\"top_p\":" << cfg.top_p << ","
             << "\"top_k\":" << cfg.top_k << ","
             << "\"do_sample\":" << (cfg.do_sample ? "true" : "false") << "}";
        int backoff = retry_.initial_backoff_ms;
        for (int attempt = 0; attempt < retry_.max_attempts; ++attempt) {
            std::string resp;
            int code = detail::http_post(host_, port_, "/api/v1/generate",
                                         body.str(), &resp);
            if (code == 200) {
                if (text) *text = detail::json_string_field(resp, "text");
                return true;
            }
            if (code == 400 || code == 401) {  // not retryable
                if (error) *error = resp;
                return false;
            }
            if (error) *error = resp.empty() ? "connection failed" : resp;
            std::this_thread::sleep_for(std::chrono::milliseconds(backoff));
            backoff = std::min<int>(backoff * retry_.multiplier,
                                    retry_.max_backoff_ms);
        }
        return false;
    }


  private:
    std::string host_;
    int port_;
    RetryPolicy retry_;
};

}  // namespace dp

#ifdef DPCLIENT_MAIN
#include <cstdio>

int main(int argc, char** argv) {
    if (argc < 4) {
        fprintf(stderr,
                "usage: dpclient HOST PORT PROMPT [MAX_TOKENS] [TEMP]\n");
        return 2;
    }
    dp::GenerationConfig cfg;
    if (argc > 4) cfg.max_tokens = atoi(argv[4]);
    if (argc > 5) { cfg.temperature = atof(argv[5]);
                    cfg.do_sample = cfg.temperature > 0; }
    dp::Client client(argv[1], atoi(argv[2]));
    std::string text, error;
    if (!client.generate(argv[3], cfg, &text, &error)) {
        fprintf(stderr, "error: %s\n", error.c_str());
        return 1;
    }
    printf("%s\n", text.c_str());
    return 0;
}
#endif

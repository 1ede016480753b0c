// Native IO runtime: fast text-format readers/writers for the
// framework's reference-compatible file formats.
//
// The reference's IO lives in C++ (readFile/readSparseMat/readDenseVec,
// LinerProgramming/.../LPboxADMMsolver.cpp:2407-2545, and the xiter CSV
// dumps at :903-909).  This runtime provides the TPU framework's
// equivalents as a small C library consumed through ctypes
// (runtime/io.py): COO triplet instance parsing, dense vector parsing,
// and buffered trajectory-CSV writing -- the host-side hot paths when
// generating or replaying large imitation datasets.
//
// Build: scripts/build_native.sh (g++ -O3 -shared), loaded lazily.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>
#include <vector>

extern "C" {

// Parse a "row,col,val\n" triplet file (1-indexed rows/cols as written
// by the CA generator).  Returns the number of triplets, or -1 on
// error.  Caller passes capacity; call with caps=0 to query the count.
int64_t read_coo(const char* path, int64_t* rows, int64_t* cols,
                 double* vals, int64_t cap) {
    FILE* fp = fopen(path, "r");
    if (!fp) return -1;
    // Read whole file for speed.
    fseek(fp, 0, SEEK_END);
    long size = ftell(fp);
    fseek(fp, 0, SEEK_SET);
    std::vector<char> buf(size + 1);
    size_t got = fread(buf.data(), 1, size, fp);
    fclose(fp);
    buf[got] = '\0';

    int64_t n = 0;
    char* p = buf.data();
    while (*p) {
        char* end;
        long r = strtol(p, &end, 10);
        if (end == p) break;
        if (*end != ',') return -1;  // malformed line: fail, don't
        p = end + 1;                 // fabricate zero triplets
        long c = strtol(p, &end, 10);
        if (end == p || *end != ',') return -1;
        p = end + 1;
        double v = strtod(p, &end);
        if (end == p) return -1;
        p = end;
        if (*p != '\0' && *p != '\n' && *p != '\r') return -1;
        while (*p == '\n' || *p == '\r') p++;
        if (n < cap) {
            rows[n] = r;
            cols[n] = c;
            vals[n] = v;
        }
        n++;
    }
    return n;
}

// Parse one double per line.  Returns count (caps semantics as above).
int64_t read_dense_vec(const char* path, double* out, int64_t cap) {
    FILE* fp = fopen(path, "r");
    if (!fp) return -1;
    fseek(fp, 0, SEEK_END);
    long size = ftell(fp);
    fseek(fp, 0, SEEK_SET);
    std::vector<char> buf(size + 1);
    size_t got = fread(buf.data(), 1, size, fp);
    fclose(fp);
    buf[got] = '\0';

    int64_t n = 0;
    char* p = buf.data();
    while (*p) {
        char* end;
        double v = strtod(p, &end);
        if (end == p) break;
        p = end;
        while (*p == '\n' || *p == '\r' || *p == ' ') p++;
        if (n < cap) out[n] = v;
        n++;
    }
    return n;
}

// Write a trajectory CSV: one "Iter{i},v0,...,v{n-1}" line per
// iteration column.  data is row-major (n, T).  Returns 0 on success.
int write_xiter(const char* path, const double* data, int64_t n,
                int64_t T, int64_t start_iter) {
    FILE* fp = fopen(path, "w");
    if (!fp) return -1;
    std::vector<char> iobuf(1 << 20);
    setvbuf(fp, iobuf.data(), _IOFBF, iobuf.size());
    for (int64_t t = 0; t < T; t++) {
        fprintf(fp, "Iter%lld", (long long)(start_iter + t + 1));
        for (int64_t i = 0; i < n; i++) {
            fprintf(fp, ",%f", data[i * T + t]);
        }
        fputc('\n', fp);
    }
    fclose(fp);
    return 0;
}

}  // extern "C"

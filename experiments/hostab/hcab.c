/* Raw-engine HC A/B: lz4tpu_encode_hc vs canonical LZ4_compress_HC,
 * same blocks, strictly interleaved, paired per-round ratios.
 * Usage: ./hcab <corpus> <level> <block> <rounds> */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>
#include <time.h>
#include <dlfcn.h>

typedef int64_t (*enc_hc_t)(const uint8_t *, int64_t, int64_t,
                            uint8_t *, int64_t, int32_t);
typedef int64_t (*enc_opt_t)(const uint8_t *, int64_t, int64_t,
                             uint8_t *, int64_t, int32_t);
typedef int (*lz4hc_t)(const char *, char *, int, int, int);

static double now(void) {
    struct timespec ts; clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + ts.tv_nsec * 1e-9;
}
static int cmpd(const void *a, const void *b) {
    double x = *(const double *)a, y = *(const double *)b;
    return x < y ? -1 : x > y;
}

int main(int argc, char **argv) {
    if (argc < 5) {
        fprintf(stderr, "usage: hcab <corpus> <level> <block> <rounds> [ours.so]\n");
        return 1;
    }
    const char *path = argv[1];
    int level = atoi(argv[2]);
    long block = atol(argv[3]);
    int rounds = atoi(argv[4]);
    const char *ours_so = argc > 5 ? argv[5]
        : "/root/repo/lz4_tpu/native/liblz4tpu-cpython-312.so";

    void *h1 = dlopen(ours_so, RTLD_NOW);
    void *h2 = dlopen("/usr/lib/x86_64-linux-gnu/liblz4.so.1", RTLD_NOW);
    if (!h1 || !h2) { fprintf(stderr, "dlopen: %s\n", dlerror()); return 1; }
    enc_hc_t ours_hc = (enc_hc_t)dlsym(h1, "lz4tpu_encode_hc");
    enc_opt_t ours_opt = (enc_opt_t)dlsym(h1, "lz4tpu_encode_opt");
    lz4hc_t canon = (lz4hc_t)dlsym(h2, "LZ4_compress_HC");
    if (!ours_hc || !ours_opt || !canon) {
        fprintf(stderr, "dlsym failed\n"); return 1;
    }

    FILE *f = fopen(path, "rb");
    fseek(f, 0, SEEK_END); long total = ftell(f); fseek(f, 0, SEEK_SET);
    uint8_t *data = malloc(total);
    if (fread(data, 1, total, f) != (size_t)total) return 2;
    fclose(f);

    long nb = (total + block - 1) / block;
    long bound = block + block / 255 + 16;
    uint8_t *dst = malloc(bound);

    /* parity check */
    long so = 0, sc = 0;
    for (long i = 0; i < nb; i++) {
        long off = i * block, len = (off + block <= total) ? block : total - off;
        int64_t r1 = level >= 10
            ? ours_opt(data + off, len, 0, dst, bound, level)
            : ours_hc(data + off, len, 0, dst, bound, level);
        so += r1;
        uint8_t *tmp = malloc(bound);
        int r2 = canon((char *)(data + off), (char *)tmp, len, bound, level);
        sc += r2;
        if (r1 != r2 || memcmp(dst, tmp, r2)) {
            fprintf(stderr, "PARITY BROKEN block %ld (%lld vs %d)\n",
                    i, (long long)r1, r2);
            return 3;
        }
        free(tmp);
    }
    printf("parity ok, sizes %ld == %ld, ratio %.4f\n", so, sc,
           (double)so / total);

    double *ratios = malloc(sizeof(double) * rounds);
    for (int r = 0; r < rounds; r++) {
        double t0 = now();
        for (long i = 0; i < nb; i++) {
            long off = i * block, len = (off + block <= total) ? block : total - off;
            if (level >= 10) ours_opt(data + off, len, 0, dst, bound, level);
            else ours_hc(data + off, len, 0, dst, bound, level);
        }
        double t1 = now();
        for (long i = 0; i < nb; i++) {
            long off = i * block, len = (off + block <= total) ? block : total - off;
            canon((char *)(data + off), (char *)dst, len, bound, level);
        }
        double t2 = now();
        ratios[r] = (t2 - t1) / (t1 - t0);
        printf("round %d: ours %.4f GB/s canon %.4f GB/s paired %.4f\n",
               r, total / (t1 - t0) / 1e9, total / (t2 - t1) / 1e9, ratios[r]);
    }
    qsort(ratios, rounds, sizeof(double), cmpd);
    printf("L%d block=%ld median paired ours/canon: %.4f\n",
           level, block, ratios[rounds / 2]);
    return 0;
}

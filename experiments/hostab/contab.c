/* Continue-schedule A/B: lz4tpu_encode_fast_continue vs canonical
 * LZ4_compress_fast_continue over contiguous 64KB blocks.
 * Usage: ./contab <corpus> <block> <rounds> */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>
#include <time.h>
#include <dlfcn.h>
typedef int64_t (*cont_t)(const uint8_t *, int64_t, int64_t, uint8_t *, int64_t, int32_t, uint32_t *);
static double now(void){struct timespec ts;clock_gettime(CLOCK_MONOTONIC,&ts);return ts.tv_sec+ts.tv_nsec*1e-9;}
static int cmpd(const void*a,const void*b){double x=*(const double*)a,y=*(const double*)b;return x<y?-1:x>y;}
int main(int argc, char **argv) {
    if (argc < 4) {
        fprintf(stderr, "usage: contab <corpus> <block> <rounds>\n");
        return 1;
    }
    const char *path = argv[1];
    long block = atol(argv[2]);
    int rounds = atoi(argv[3]);
    void *h1 = dlopen("/root/repo/lz4_tpu/native/liblz4tpu-cpython-312.so", RTLD_NOW);
    void *h2 = dlopen("/usr/lib/x86_64-linux-gnu/liblz4.so.1", RTLD_NOW);
    cont_t ours = (cont_t)dlsym(h1, "lz4tpu_encode_fast_continue");
    void *(*createStream)(void) = (void *(*)(void))dlsym(h2, "LZ4_createStream");
    void (*resetStream)(void *) = (void (*)(void *))dlsym(h2, "LZ4_resetStream_fast");
    int (*freeStream)(void *) = (int (*)(void *))dlsym(h2, "LZ4_freeStream");
    int (*contc)(void *, const char *, char *, int, int, int) =
        (int (*)(void *, const char *, char *, int, int, int))dlsym(h2, "LZ4_compress_fast_continue");
    if (!ours || !createStream || !contc) { fprintf(stderr, "dlsym failed\n"); return 1; }
    FILE *f = fopen(path, "rb");
    fseek(f,0,SEEK_END); long total=ftell(f); fseek(f,0,SEEK_SET);
    uint8_t *data = malloc(total);
    if (fread(data,1,total,f)!=(size_t)total) return 2;
    fclose(f);
    long nb=(total+block-1)/block, bound=block+block/255+16;
    uint8_t *d1=malloc(bound), *d2=malloc(bound);
    uint32_t *table = malloc(sizeof(uint32_t) << 12);
    void *st = createStream();
    /* parity: whole sequence, ours vs canonical per block */
    memset(table, 0, sizeof(uint32_t) << 12);
    if (resetStream) resetStream(st);
    for (long i=0;i<nb;i++){
        long off=i*block, len=(off+block<=total)?block:total-off;
        int64_t r1 = ours(data, off, len, d1, bound, 1, table);
        int r2 = contc(st, (char*)(data+off), (char*)d2, len, bound, 1);
        if (r1!=r2 || memcmp(d1,d2,r2)){fprintf(stderr,"CONTINUE PARITY BROKEN block %ld (%lld vs %d)\n",i,(long long)r1,r2);return 3;}
    }
    printf("continue parity ok over %ld blocks\n", nb);
    double *rr=malloc(sizeof(double)*rounds);
    for (int r=0;r<rounds;r++){
        double t0=now();
        memset(table, 0, sizeof(uint32_t) << 12);
        for(long i=0;i<nb;i++){
            long off=i*block, len=(off+block<=total)?block:total-off;
            ours(data, off, len, d1, bound, 1, table);
        }
        double t1=now();
        if (resetStream) resetStream(st); else { freeStream(st); st = createStream(); }
        for(long i=0;i<nb;i++){
            long off=i*block, len=(off+block<=total)?block:total-off;
            contc(st, (char*)(data+off), (char*)d2, len, bound, 1);
        }
        double t2=now();
        rr[r]=(t2-t1)/(t1-t0);
        printf("round %d: ours %.4f canon %.4f GB/s paired %.4f\n",
               r, total/(t1-t0)/1e9, total/(t2-t1)/1e9, rr[r]);
    }
    qsort(rr,rounds,sizeof(double),cmpd);
    printf("continue block=%ld median paired ours/canon: %.4f\n", block, rr[rounds/2]);
    return 0;
}

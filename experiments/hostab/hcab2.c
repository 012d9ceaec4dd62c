/* 3-leg interleaved A/B: ours-A vs ours-B vs canonical, paired ratios.
 * Usage: ./hcab2 <corpus> <level> <block> <rounds> <soA> <soB> */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>
#include <time.h>
#include <dlfcn.h>
typedef int64_t (*enc_t)(const uint8_t *, int64_t, int64_t, uint8_t *, int64_t, int32_t);
typedef int (*lz4hc_t)(const char *, char *, int, int, int);
static double now(void){struct timespec ts;clock_gettime(CLOCK_MONOTONIC,&ts);return ts.tv_sec+ts.tv_nsec*1e-9;}
static int cmpd(const void*a,const void*b){double x=*(const double*)a,y=*(const double*)b;return x<y?-1:x>y;}
int main(int argc, char **argv) {
    if (argc < 7) {
        fprintf(stderr, "usage: hcab2 <corpus> <level> <block> <rounds> <soA> <soB>\n");
        return 1;
    }
    const char *path = argv[1];
    int level = atoi(argv[2]);
    long block = atol(argv[3]);
    int rounds = atoi(argv[4]);
    void *hA = dlopen(argv[5], RTLD_NOW|RTLD_LOCAL);
    void *hB = dlopen(argv[6], RTLD_NOW|RTLD_LOCAL);
    void *hC = dlopen("/usr/lib/x86_64-linux-gnu/liblz4.so.1", RTLD_NOW|RTLD_LOCAL);
    if (!hA||!hB||!hC){fprintf(stderr,"dlopen: %s\n",dlerror());return 1;}
    const char *sym = level >= 10 ? "lz4tpu_encode_opt" : "lz4tpu_encode_hc";
    enc_t encA = (enc_t)dlsym(hA, sym), encB = (enc_t)dlsym(hB, sym);
    lz4hc_t canon = (lz4hc_t)dlsym(hC, "LZ4_compress_HC");
    if (!encA || !encB || !canon) {
        fprintf(stderr, "dlsym failed\n"); return 1;
    }
    FILE *f = fopen(path, "rb");
    fseek(f,0,SEEK_END); long total=ftell(f); fseek(f,0,SEEK_SET);
    uint8_t *data = malloc(total);
    if (fread(data,1,total,f)!=(size_t)total) return 2;
    fclose(f);
    long nb=(total+block-1)/block, bound=block+block/255+16;
    uint8_t *d1=malloc(bound), *d2=malloc(bound), *d3=malloc(bound);
    long sA=0,sB=0,sC=0;
    for (long i=0;i<nb;i++){
        long off=i*block, len=(off+block<=total)?block:total-off;
        int64_t rA=encA(data+off,len,0,d1,bound,level);
        int64_t rB=encB(data+off,len,0,d2,bound,level);
        int rC=canon((char*)(data+off),(char*)d3,len,bound,level);
        sA+=rA;sB+=rB;sC+=rC;
        if (rA!=rC||rB!=rC||memcmp(d1,d3,rC)||memcmp(d2,d3,rC)){
            fprintf(stderr,"PARITY BROKEN block %ld\n",i);return 3;}
    }
    printf("parity ok: %ld == %ld == %ld\n", sA, sB, sC);
    double *rAB=malloc(sizeof(double)*rounds), *rAC=malloc(sizeof(double)*rounds), *rBC=malloc(sizeof(double)*rounds);
    for (int r=0;r<rounds;r++){
        double t0=now();
        for(long i=0;i<nb;i++){long off=i*block,len=(off+block<=total)?block:total-off;encA(data+off,len,0,d1,bound,level);}
        double t1=now();
        for(long i=0;i<nb;i++){long off=i*block,len=(off+block<=total)?block:total-off;encB(data+off,len,0,d2,bound,level);}
        double t2=now();
        for(long i=0;i<nb;i++){long off=i*block,len=(off+block<=total)?block:total-off;canon((char*)(data+off),(char*)d3,len,bound,level);}
        double t3=now();
        rAB[r]=(t1-t0)/(t2-t1);   /* A time / B time: <1 = A faster */
        rAC[r]=(t3-t2)/(t1-t0);   /* A speed vs canon: >1 = A wins */
        rBC[r]=(t3-t2)/(t2-t1);
        printf("round %d: A %.4f  B %.4f  C %.4f GB/s | tA/tB %.4f  A/C %.4f  B/C %.4f\n",
               r, total/(t1-t0)/1e9, total/(t2-t1)/1e9, total/(t3-t2)/1e9, rAB[r], rAC[r], rBC[r]);
    }
    qsort(rAB,rounds,sizeof(double),cmpd);qsort(rAC,rounds,sizeof(double),cmpd);qsort(rBC,rounds,sizeof(double),cmpd);
    printf("medians: tA/tB %.4f (<1 = A faster) | speed A/canon %.4f | B/canon %.4f\n",
           rAB[rounds/2], rAC[rounds/2], rBC[rounds/2]);
    return 0;
}

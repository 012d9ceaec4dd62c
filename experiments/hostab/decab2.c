/* 3-leg decode A/B: ours-A vs ours-B vs canonical LZ4_decompress_safe.
 * Usage: ./decab2 <corpus> <level> <block> <rounds> <soA> <soB> */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>
#include <time.h>
#include <dlfcn.h>
typedef int64_t (*dec_t)(const uint8_t *, int64_t, const uint8_t *, int64_t,
                         uint8_t *, int64_t, int64_t);
typedef int (*lz4d_t)(const char *, char *, int, int);
typedef int (*lz4c_t)(const char *, char *, int, int);
typedef int (*lz4hc_t)(const char *, char *, int, int, int);
static double now(void){struct timespec ts;clock_gettime(CLOCK_MONOTONIC,&ts);return ts.tv_sec+ts.tv_nsec*1e-9;}
static int cmpd(const void*a,const void*b){double x=*(const double*)a,y=*(const double*)b;return x<y?-1:x>y;}
int main(int argc, char **argv) {
    if (argc < 7) {
        fprintf(stderr, "usage: decab2 <corpus> <level> <block> <rounds> <soA> <soB>\n");
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
    dec_t decA = (dec_t)dlsym(hA, "lz4tpu_decode");
    dec_t decB = (dec_t)dlsym(hB, "lz4tpu_decode");
    lz4d_t canond = (lz4d_t)dlsym(hC, "LZ4_decompress_safe");
    lz4c_t canonc = (lz4c_t)dlsym(hC, "LZ4_compress_default");
    lz4hc_t canonhc = (lz4hc_t)dlsym(hC, "LZ4_compress_HC");
    if (!decA || !decB || !canond || !canonc || !canonhc) {
        fprintf(stderr, "dlsym failed\n"); return 1;
    }
    FILE *f = fopen(path, "rb");
    fseek(f,0,SEEK_END); long total=ftell(f); fseek(f,0,SEEK_SET);
    uint8_t *data = malloc(total);
    if (fread(data,1,total,f)!=(size_t)total) return 2;
    fclose(f);
    long nb=(total+block-1)/block, bound=block+block/255+16;
    uint8_t **cs = malloc(nb*sizeof(void*)); long *cl = malloc(nb*sizeof(long));
    for (long i=0;i<nb;i++){
        long off=i*block, len=(off+block<=total)?block:total-off;
        cs[i]=malloc(bound);
        cl[i]= level>=3 ? canonhc((char*)(data+off),(char*)cs[i],len,bound,level)
                        : canonc((char*)(data+off),(char*)cs[i],len,bound);
    }
    uint8_t *dst=malloc(block+64);
    for (long i=0;i<nb;i++){
        long off=i*block, len=(off+block<=total)?block:total-off;
        int64_t rA=decA(cs[i],cl[i],0,0,dst,block+64,-1);
        int okA = rA==len && !memcmp(dst,data+off,len);
        int64_t rB=decB(cs[i],cl[i],0,0,dst,block+64,-1);
        int okB = rB==len && !memcmp(dst,data+off,len);
        if (!okA||!okB){fprintf(stderr,"DECODE BROKEN %ld (A %d B %d)\n",i,okA,okB);return 3;}
    }
    printf("parity ok\n");
    double *rAB=malloc(sizeof(double)*rounds), *rAC=malloc(sizeof(double)*rounds);
    for (int r=0;r<rounds;r++){
        double t0=now();
        for(long i=0;i<nb;i++) decA(cs[i],cl[i],0,0,dst,block+64,-1);
        double t1=now();
        for(long i=0;i<nb;i++) decB(cs[i],cl[i],0,0,dst,block+64,-1);
        double t2=now();
        for(long i=0;i<nb;i++){
            long off=i*block, len=(off+block<=total)?block:total-off;
            canond((char*)cs[i],(char*)dst,cl[i],len);
        }
        double t3=now();
        rAB[r]=(t1-t0)/(t2-t1);
        rAC[r]=(t3-t2)/(t1-t0);
        printf("round %d: A %.3f B %.3f C %.3f GB/s | tA/tB %.4f A/C %.4f\n",
               r, total/(t1-t0)/1e9, total/(t2-t1)/1e9, total/(t3-t2)/1e9, rAB[r], rAC[r]);
    }
    qsort(rAB,rounds,sizeof(double),cmpd);qsort(rAC,rounds,sizeof(double),cmpd);
    printf("decode L%d: median tA/tB %.4f (<1 = A faster) | A/canon %.4f\n",
           level, rAB[rounds/2], rAC[rounds/2]);
    return 0;
}

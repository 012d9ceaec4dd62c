/* Raw decode A/B: lz4tpu_decode vs LZ4_decompress_safe on the same stream.
 * Usage: ./decab <corpus> <level> <block> <rounds> */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>
#include <time.h>
#include <dlfcn.h>
typedef int64_t (*dec_t)(const uint8_t *, int64_t, const uint8_t *, int64_t, uint8_t *, int64_t, int64_t);
typedef int (*lz4d_t)(const char *, char *, int, int);
typedef int (*lz4c_t)(const char *, char *, int, int);
typedef int (*lz4hc_t)(const char *, char *, int, int, int);
static double now(void){struct timespec ts;clock_gettime(CLOCK_MONOTONIC,&ts);return ts.tv_sec+ts.tv_nsec*1e-9;}
static int cmpd(const void*a,const void*b){double x=*(const double*)a,y=*(const double*)b;return x<y?-1:x>y;}
int main(int argc, char **argv) {
    if (argc < 5) {
        fprintf(stderr, "usage: decab <corpus> <level> <block> <rounds>\n");
        return 1;
    }
    const char *path = argv[1];
    int level = atoi(argv[2]);
    long block = atol(argv[3]);
    int rounds = atoi(argv[4]);
    void *h1 = dlopen("/root/repo/lz4_tpu/native/liblz4tpu-cpython-312.so", RTLD_NOW);
    void *h2 = dlopen("/usr/lib/x86_64-linux-gnu/liblz4.so.1", RTLD_NOW);
    if (!h1 || !h2) { fprintf(stderr, "dlopen: %s\n", dlerror()); return 1; }
    dec_t ours = (dec_t)dlsym(h1, "lz4tpu_decode");
    lz4d_t canond = (lz4d_t)dlsym(h2, "LZ4_decompress_safe");
    lz4c_t canonc = (lz4c_t)dlsym(h2, "LZ4_compress_default");
    lz4hc_t canonhc = (lz4hc_t)dlsym(h2, "LZ4_compress_HC");
    if (!ours || !canond || !canonc || !canonhc) {
        fprintf(stderr, "dlsym failed\n"); return 1;
    }
    FILE *f = fopen(path, "rb");
    fseek(f,0,SEEK_END); long total=ftell(f); fseek(f,0,SEEK_SET);
    uint8_t *data = malloc(total);
    if (fread(data,1,total,f)!=(size_t)total) return 2;
    fclose(f);
    long nb=(total+block-1)/block, bound=block+block/255+16;
    /* compress every block with canonical at <level> */
    uint8_t **cs = malloc(nb*sizeof(void*)); long *cl = malloc(nb*sizeof(long));
    long csum = 0;
    for (long i=0;i<nb;i++){
        long off=i*block, len=(off+block<=total)?block:total-off;
        cs[i]=malloc(bound);
        cl[i]= level>=3 ? canonhc((char*)(data+off),(char*)cs[i],len,bound,level)
                        : canonc((char*)(data+off),(char*)cs[i],len,bound);
        csum += cl[i];
    }
    printf("stream ratio %.4f\n", (double)csum/total);
    uint8_t *dst=malloc(block+64);
    /* parity */
    for (long i=0;i<nb;i++){
        long off=i*block, len=(off+block<=total)?block:total-off;
        int64_t r=ours(cs[i],cl[i],0,0,dst,block+64,-1);
        if (r!=len||memcmp(dst,data+off,len)){fprintf(stderr,"DECODE BROKEN %ld\n",i);return 3;}
    }
    double *rr=malloc(sizeof(double)*rounds);
    for (int r=0;r<rounds;r++){
        double t0=now();
        for(long i=0;i<nb;i++) ours(cs[i],cl[i],0,0,dst,block+64,-1);
        double t1=now();
        for(long i=0;i<nb;i++){
            long off=i*block, len=(off+block<=total)?block:total-off;
            canond((char*)cs[i],(char*)dst,cl[i],len);
        }
        double t2=now();
        rr[r]=(t2-t1)/(t1-t0);
        printf("round %d: ours %.3f GB/s canon %.3f GB/s paired %.4f\n",
               r, total/(t1-t0)/1e9, total/(t2-t1)/1e9, rr[r]);
    }
    qsort(rr,rounds,sizeof(double),cmpd);
    printf("decode L%d block=%ld median paired ours/canon: %.4f\n", level, block, rr[rounds/2]);
    return 0;
}

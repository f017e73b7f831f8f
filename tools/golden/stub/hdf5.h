/* Declaration-only HDF5 stand-in for golden-harness builds.  The abea
 * harness never opens fast5 files, so fast5lite.h's static-inline helpers
 * only need these to COMPILE; none are emitted, nothing links against
 * HDF5. */
#ifndef GOLDEN_STUB_HDF5_H
#define GOLDEN_STUB_HDF5_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef int64_t hid_t;
typedef int herr_t;
typedef uint64_t hsize_t;
typedef int64_t hssize_t;
typedef int htri_t;

#define H5F_ACC_RDONLY 0u
#define H5P_DEFAULT ((hid_t)0)
#define H5S_ALL ((hid_t)0)
#define H5T_NATIVE_FLOAT ((hid_t)1)

typedef enum { H5_INDEX_NAME = 0, H5_INDEX_CRT_ORDER } H5_index_t;
typedef enum { H5_ITER_INC = 0, H5_ITER_DEC, H5_ITER_NATIVE } H5_iter_order_t;

hid_t H5Fopen(const char *, unsigned, hid_t);
herr_t H5Fclose(hid_t);
hid_t H5Gopen(hid_t, const char *, hid_t);
herr_t H5Gclose(hid_t);
hid_t H5Dopen(hid_t, const char *, hid_t);
herr_t H5Dclose(hid_t);
hid_t H5Dget_space(hid_t);
herr_t H5Dread(hid_t, hid_t, hid_t, hid_t, hid_t, void *);
herr_t H5Sclose(hid_t);
int H5Sget_simple_extent_dims(hid_t, hsize_t *, hsize_t *);
hid_t H5Aopen(hid_t, const char *, hid_t);
herr_t H5Aclose(hid_t);
herr_t H5Aread(hid_t, hid_t, void *);
htri_t H5Aexists(hid_t, const char *);
hsize_t H5Aget_storage_size(hid_t);
hid_t H5Aget_type(hid_t);
herr_t H5Tclose(hid_t);
htri_t H5Tis_variable_str(hid_t);
htri_t H5Lexists(hid_t, const char *, hid_t);
hssize_t H5Lget_name_by_idx(hid_t, const char *, H5_index_t, H5_iter_order_t,
                            hsize_t, char *, size_t, hid_t);

#ifdef __cplusplus
}
#endif

#endif /* GOLDEN_STUB_HDF5_H */

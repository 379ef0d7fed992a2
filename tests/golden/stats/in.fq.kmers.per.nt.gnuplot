set output '<OUTDIR>/in.fq.kmers.per.nt.png'
set terminal png nocrop enhanced font arial 10 size 640,360
set ylabel 'Number of K-mers'
set xlabel 'Nucleotide position'
set ytics border in scale 1,0.5 mirror norotate  offset character 0, 0, 0
set title 'Relative Enrichment over Read Length'
set xrange [ 0 : 55 ] noreverse nowriteback
set autoscale y
set lmargin '10'
set rmargin '4'
set tmargin '3'
set bmargin '4'
plot '<OUTDIR>/in.fq.kmers.per.nt.data' using 1:2 title 'ACGGT' with lines, '<OUTDIR>/in.fq.kmers.per.nt.data' using 1:3 title 'CCACA' with lines, '<OUTDIR>/in.fq.kmers.per.nt.data' using 1:4 title 'GAAGT' with lines, '<OUTDIR>/in.fq.kmers.per.nt.data' using 1:5 title 'GATAA' with lines, '<OUTDIR>/in.fq.kmers.per.nt.data' using 1:6 title 'GATCA' with lines
